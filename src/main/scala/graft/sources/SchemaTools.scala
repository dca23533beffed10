package graft.sources

import org.apache.spark.sql.types._

/** The reference's eight-type schema system re-expressed over Spark types:
  * parse of user type strings, DDL generation, and source↔destination column
  * reconciliation (SURVEY.md §1.2, §2.2).
  */
object SchemaTools {

  /** Parse a type override string the way `ParseDatabaseTypeFromString` does
    * (/root/reference/schema/schema.go:132-136, 160-194): the teleport type
    * vocabulary, case-insensitive, with optional options.
    *   integer | float | decimal(p,s) | string(n) | text | boolean | date | timestamp
    * Unknown types → None (the reference skips the column with a warning,
    * schema.go:96-99).
    */
  def parseType(s: String): Option[DataType] = {
    val Dec = """(?i)decimal\((\d+),\s*(\d+)\)""".r
    val Str = """(?i)(?:string|varchar)\((\d+)\)""".r
    s.trim match {
      // int/smallint/long accepted as aliases: common hand-written forms
      // (and pre-fix port-convert output) — all store as the engine's one
      // integer width, exactly like the reference's INTEGER
      case t if t.equalsIgnoreCase("integer") || t.equalsIgnoreCase("bigint") ||
        t.equalsIgnoreCase("int") || t.equalsIgnoreCase("smallint") ||
        t.equalsIgnoreCase("long") => Some(LongType)
      case t if t.equalsIgnoreCase("float") || t.equalsIgnoreCase("double") => Some(DoubleType)
      case Dec(p, sc) => Some(DecimalType(p.toInt, sc.toInt))
      case Str(_) => Some(StringType) // LENGTH enforced by validation, not storage
      case t if t.equalsIgnoreCase("string") || t.equalsIgnoreCase("text") => Some(StringType)
      case t if t.equalsIgnoreCase("boolean") => Some(BooleanType)
      case t if t.equalsIgnoreCase("date") => Some(DateType)
      case t if t.equalsIgnoreCase("timestamp") => Some(TimestampType)
      case _ => None
    }
  }

  /** Emit the teleport type string for a Spark type — inverse of parseType,
    * ≙ GenerateDataTypeExpression (schema/schema.go:264-291). */
  def typeString(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType => "INTEGER"
    case DoubleType | FloatType => "FLOAT"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case StringType => "TEXT"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case other => throw new IllegalArgumentException(s"no teleport type for $other")
  }

  /** CREATE TABLE DDL from a schema. ≙ GenerateCreateTableStatement
    * (schema/schema.go:243-262). Identifiers double-quoted
    * (schema.go:138-143). */
  def createTableDdl(table: String, schema: StructType): String = {
    val cols = schema.fields.map(f => s""""${f.name}" ${typeString(f.dataType)}""")
    s"""CREATE TABLE "$table" (\n  ${cols.mkString(",\n  ")}\n)"""
  }

  /** Column reconciliation ≙ importableColumns (/root/reference/load.go:
    * 193-237): shared columns (case-insensitive) keep the destination's
    * type; returns (importable, sourceOnly, destOnly) so callers can warn
    * exactly like the reference does — or evolve instead (SchemaEvolution).
    */
  def reconcile(source: StructType, dest: StructType): (StructType, Seq[String], Seq[String]) = {
    val destByName = dest.fields.map(f => f.name.toLowerCase -> f).toMap
    val importable = source.fields.flatMap(f => destByName.get(f.name.toLowerCase))
    val srcNames = source.fieldNames.map(_.toLowerCase).toSet
    val destNames = dest.fieldNames.map(_.toLowerCase).toSet
    val sourceOnly = source.fieldNames.filterNot(n => destNames.contains(n.toLowerCase)).toSeq
    val destOnly = dest.fieldNames.filterNot(n => srcNames.contains(n.toLowerCase)).toSeq
    (StructType(importable), sourceOnly, destOnly)
  }

  /** Width/precision widening warnings ≙ load.go:219-232: returns the
    * columns whose destination type cannot hold the source type. */
  def narrowingColumns(source: StructType, dest: StructType): Seq[String] = {
    val destByName = dest.fields.map(f => f.name.toLowerCase -> f).toMap
    source.fields.toSeq.flatMap { sf =>
      destByName.get(sf.name.toLowerCase).collect {
        case df if narrows(sf.dataType, df.dataType) => sf.name
      }
    }
  }

  private def narrows(src: DataType, dst: DataType): Boolean = (src, dst) match {
    case (LongType, IntegerType | ShortType | ByteType) => true
    case (DoubleType, FloatType) => true
    case (s: DecimalType, d: DecimalType) =>
      d.precision < s.precision || d.scale < s.scale
    case (TimestampType, DateType) => true
    case _ => false
  }
}
