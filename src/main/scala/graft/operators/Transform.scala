package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.lake.LakeTable
import graft.sources.SchemaTools

/** The reference's in-warehouse SQL Transform step (`teleport transform`,
  * /root/reference/transform.go:10-40): `DROP staging; CREATE TABLE staging AS
  * <sql>; swap-rename in one tx` — re-expressed as Catalyst executing the SQL
  * and an atomic LakeTable snapshot replacing the table (the overwrite commit
  * IS the rename-in-tx). Catalyst replaces the entire external warehouse
  * (SURVEY.md §3.3).
  */
object SqlTransform {

  /** Run `sql` (tables must be registered as temp views / catalog tables)
    * and publish the result as the new content of `dest`. Empty `keyCols`
    * buckets by the result's first column (the reference's transform output
    * has no declared key either, transform.go:10-40). Bucket count for a
    * NEW destination comes from `graft.transform.numBuckets` (default 16 —
    * transform outputs are typically aggregates): numBuckets is fixed at
    * create, so size it for the result's target scale (~0.5-2 GB/bucket,
    * the LakeTable sizing rule) — a hardcoded granule would force a full
    * rebucket() rewrite on any large output. */
  def apply(spark: SparkSession, sql: String, dest: LakeTable,
      keyCols: Seq[String], appId: String): Unit = {
    val result = spark.sql(sql)
    val keys = if (keyCols.nonEmpty) keyCols else result.columns.take(1).toSeq
    val buckets = spark.conf.getOption("graft.transform.numBuckets")
      .map(_.toInt).getOrElse(16)
    if (!dest.exists) dest.create(result.schema, buckets, appId, keys)
    dest.overwrite(result, keys, appId)
  }
}

/** Per-column scalar transform chains + computed columns — the reference's
  * Starlark `TransformColumn` / `ComputeColumn` config surface
  * (/root/reference/database_configuration.go:220-263, database.go:367-404)
  * as declarative Catalyst expressions: a chain of named scalar ops with an
  * optional type override, and computed columns from SQL expressions over
  * the whole row. Convention-over-configuration without a row-at-a-time
  * interpreter — everything stays codegen'd Columns.
  */
object ColumnTransforms {

  /** The built-in scalar vocabulary (covers every transform in the
    * reference's fixture corpus — SURVEY.md §2.8 F1-F6). `sql:<expr>` escapes
    * to any Catalyst SQL over the ROW (reference columns by name; the result
    * replaces the spec's column) — the declarative stand-in for an arbitrary
    * lambda transform. */
  def scalarOp(name: String): Column => Column = name match {
    case s if s.startsWith("sql:") => _ => expr(s.stripPrefix("sql:"))
    case "upper" => upper
    case "lower" => lower
    case "trim" => trim
    case s if s.startsWith("multiply:") =>
      c => c * lit(s.stripPrefix("multiply:").toDouble) // ≙ value*100 fixture
    case s if s.startsWith("strftime:") =>
      c => date_format(c, s.stripPrefix("strftime:")) // ≙ time.strftime
    case "fromtimestamp" => c => timestamp_seconds(c) // ≙ time.fromtimestamp
    case s if s.startsWith("json:") =>
      c => get_json_object(c, s.stripPrefix("json:")) // ≙ json.loads + dig
    case "yaml" => graft.functions.YamlFunctions.yamlToJson // ≙ yaml.loads (F5)
    case s if s.startsWith("strip_after:") => // ≙ value.split(sep, 1)[0]
      c => substring_index(c, s.stripPrefix("strip_after:"), 1)
    case other => throw new IllegalArgumentException(s"unknown transform op: $other")
    // arbitrary row-level expressions (≙ lambda transforms) go through
    // ComputedSpec, which accepts any Catalyst SQL over the row
  }

  case class ColumnSpec(column: String, ops: Seq[String], castTo: Option[String] = None)
  case class ComputedSpec(column: String, sqlExpr: String, castTo: Option[String] = None)

  /** Apply transform chains then computed columns, exactly the reference's
    * order (transforms on extracted values, database.go:268-294; computed
    * columns appended after, database.go:392-404). Type overrides ≙ the 3rd
    * config argument parsed by ParseDatabaseTypeFromString. */
  def apply(df: DataFrame, transforms: Seq[ColumnSpec],
      computed: Seq[ComputedSpec] = Nil): DataFrame = {
    // `yaml_to_json` must resolve inside sql:/computed expressions too (the
    // .port-translated ruby-yaml lambda path) — registration is idempotent
    graft.functions.YamlFunctions.register(df.sparkSession)
    val afterTransforms = transforms.foldLeft(df) { (d, spec) =>
      // a sql: op ignores its chained input (it re-reads the ROW by name),
      // so anywhere but FIRST it would silently discard every earlier op in
      // the chain — reject the spec instead of computing a wrong value
      spec.ops.zipWithIndex.drop(1).foreach { case (op, i) =>
        if (op.startsWith("sql:")) throw new IllegalArgumentException(
          s"column ${spec.column}: sql: op at chain position $i would discard " +
          "the preceding ops (a sql: expression reads the original row, not " +
          "the chained value) — make sql: the first op, or fold the whole " +
          "chain into one sql: expression")
      }
      val chained = spec.ops.foldLeft(col(spec.column))((c, op) => scalarOp(op)(c))
      val castDt = spec.castTo.map(parse)
      d.withColumn(spec.column, castDt.fold(chained)(chained.cast))
    }
    computed.foldLeft(afterTransforms) { (d, spec) =>
      val e = expr(spec.sqlExpr)
      d.withColumn(spec.column, spec.castTo.map(parse).fold(e)(e.cast))
    }
  }

  private def parse(s: String): DataType =
    SchemaTools.parseType(s).getOrElse(
      throw new IllegalArgumentException(s"unknown type override: $s"))
}
