package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV interchange with the reference's value-normalization rules.
  *
  * The reference stages every extract as CSV and loads it with
  * empty-string-as-NULL semantics; our engine's interchange is the DataFrame
  * itself, but the rules survive as source/sink options so external CSV
  * produced for/by the reference loads identically:
  *
  *  - empty string = NULL on load (load_postgres.go:49-50, Redshift
  *    `EMPTYASNULL` load_redshift.go:36, Snowflake `EMPTY_FIELD_AS_NULL`
  *    load_snowflake.go:28)
  *  - booleans as "true"/"false" words (util.go:75-76)
  *  - DATE as `yyyy-MM-dd` (database.go:435-446), TIMESTAMP as RFC3339 UTC
  *    (util.go:82-83, load_postgres.go:51-57)
  *  - floats written in shortest-ROUND-TRIP form (the reference's
  *    `strconv.FormatFloat(v, 'E', -1, 64)` is likewise shortest-round-trip;
  *    it renders E-notation where we render Java's decimal/EN mix — both
  *    parse to the identical bits everywhere, and a fixed-precision `%E`
  *    would silently truncate doubles to 7 significant digits)
  *  - maps/arrays serialize to "" i.e. NULL (util.go:86-88) with the column
  *    POSITION kept, so downstream loaders with declared column lists stay
  *    aligned; a warning names the column
  */
object CsvSource {

  // NO emptyValue entry on READ: that option is the REPLACEMENT value
  // univocity substitutes for quoted-empty fields (not a match token), so a
  // sentinel there made `a,"",b` load as the sentinel garbage. The default
  // pipeline already does what EMPTYASNULL means: quoted or bare empty field
  // -> "" -> equals nullValue -> NULL.
  val ReadOptions: Map[String, String] = Map(
    "header" -> "true",
    "nullValue" -> "",
    // escape = the quote char → RFC4180 `""` doubling, the form Go's
    // encoding/csv and the COPY loaders write; Spark's default backslash
    // escape would misread `"he said ""hi"""`
    "escape" -> "\"",
    // optional fractional seconds on READ: external producers emit micros
    // or millis, and a seconds-only pattern silently NULLs those rows in
    // PERMISSIVE mode (our own writer emits seconds — reference RFC3339)
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSS]X",
    "dateFormat" -> "yyyy-MM-dd")

  val WriteOptions: Map[String, String] = Map(
    "header" -> "true",
    "nullValue" -> "",
    "emptyValue" -> "",
    // RFC4180 `""` doubling on write (see ReadOptions) — Go-side parsers
    // reject Spark's default backslash escaping
    "escape" -> "\"",
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ssX",
    "dateFormat" -> "yyyy-MM-dd")

  /** Load a CSV with a declared schema, applying empty=NULL + UTC timestamp
    * normalization. ≙ `importCSV` + per-dialect load options
    * (/root/reference/load.go:171-191). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.options(ReadOptions).schema(schema).csv(path)

  /** Infer schema like the reference's API CSV path: everything lands as
    * STRING first (`type table [][]string`, api.go:27), typed later by the
    * destination schema. Go's encoding/csv never yields nil for a field, so
    * the contract here is NO nulls: the sentinel nullValue keeps quoted
    * empties as "", and na.fill covers bare (unquoted) empty fields, which
    * the Spark reader nulls regardless of nullValue. */
  def readUntyped(spark: SparkSession, path: String): DataFrame =
    spark.read.options(ReadOptions + ("nullValue" -> "\u0000never\u0000"))
      .option("inferSchema", "false").csv(path)
      .na.fill("")

  /** Format columns for CSV exactly as the reference's writer does
    * (util.go:68-91): booleans→words, floats shortest-round-trip
    * (≙ FormatFloat('E', -1, 64) — see the header note on the E-notation
    * difference), timestamp→RFC3339 UTC, date→yyyy-MM-dd, non-scalars
    * dropped. Returns an all-string DataFrame ready for `df.write.csv`. */
  def formatForCsv(df: DataFrame): DataFrame = {
    val cols: Seq[Column] = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case BooleanType => Some(when(col(f.name), "true")
          .when(!col(f.name), "false").as(f.name))
        case DoubleType | FloatType =>
          // cast, not format_string("%E", _): %E truncates to 7 significant
          // digits AND renders a null argument as the literal string "NULL"
          // (java.util.Formatter) — both silent corruption on interchange
          Some(col(f.name).cast(StringType).as(f.name))
        case TimestampType =>
          Some(date_format(col(f.name), "yyyy-MM-dd'T'HH:mm:ssX").as(f.name))
        case TimestampNTZType => // session-local wall time ≙ UTC (we pin UTC)
          Some(date_format(col(f.name), "yyyy-MM-dd'T'HH:mm:ss'Z'").as(f.name))
        case DateType => Some(date_format(col(f.name), "yyyy-MM-dd").as(f.name))
        case _: StructType | _: ArrayType | _: MapType =>
          // ≙ "" (NULL) for maps/arrays, util.go:86-88 — the reference KEEPS
          // the column position; dropping it would misalign any downstream
          // loader with a declared column list, silently
          System.err.println(s"[csv] column ${f.name}: non-scalar " +
            s"${f.dataType.simpleString} serializes as NULL (reference util.go:86-88)")
          Some(lit(null).cast(StringType).as(f.name))
        case _ => Some(col(f.name).cast(StringType).as(f.name))
      }
    }
    df.select(cols: _*)
  }

  /** Write a reference-compatible CSV extract. ≙ generateCSV (util.go:32-66).
    * `mode` = append lets a page-batched endpoint drain stream batches into
    * one extract directory without accumulating rows in memory. */
  def write(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    formatForCsv(df).write.options(WriteOptions).mode(mode).csv(path)
}

/** JSON ingestion matching the reference's API JSON rules (api.go:495-556):
  * the reference keeps JSON numbers as strings to dodge 64-bit truncation;
  * we parse into declared Spark types instead (an explicit improvement — the
  * schema governs, `from_json` handles overflow as null). */
object JsonSource {
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Parse a JSON-string column against a schema. ≙ json.loads Starlark
    * transform (starlarkextensions.go:18-19). */
  def parseColumn(df: DataFrame, column: String, schema: DataType): DataFrame =
    df.withColumn(column, from_json(col(column), schema))
}
