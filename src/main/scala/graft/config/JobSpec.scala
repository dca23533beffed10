package graft.config

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.operators.ColumnTransforms.{ColumnSpec, ComputedSpec}

/** Declarative extract-load job spec — the reference's `.port` config
  * surface (Starlark `Table(...).LoadStrategy(...).TransformColumn(...)`,
  * /root/reference/database_configuration.go:100-263 and the
  * testdata/databases fixture corpus) re-expressed as a JSON file parsed
  * into the engine's native config types. Starlark's *functions* (lambda
  * transforms) map to the [[graft.operators.ColumnTransforms]] scalar-op
  * vocabulary plus SQL computed columns — declarative Catalyst expressions
  * instead of a row-at-a-time interpreter.
  *
  * Spec file shape:
  * {{{
  * {
  *   "source":      {"format": "parquet|csv|json", "path": "$DATA_DIR/events.parquet"},
  *   "destination": {"root": "/lake/events", "numBuckets": 16},
  *   "tables": {
  *     "events": {
  *       "loadStrategy": "Full" | "ModifiedOnly" | "Incremental",
  *       "primaryKey": ["event_id"],
  *       "modifiedAtColumn": "ts",
  *       "goBackHours": 36,
  *       "columns": ["*"],                        // or an explicit list
  *       "transforms": [{"column": "event_type", "ops": ["upper"], "castTo": null}],
  *       "computed":   [{"column": "day", "sql": "date_format(ts, 'yyyy-MM-dd')"}]
  *     },
  *     "*": {"loadStrategy": "Full"}              // wildcard fallback
  *   }
  * }
  * }}}
  *
  * Reference-parity rules:
  *  - missing spec file or missing table entry → `Full` over all columns
  *    (database_configuration.go:100-147 "No table configuration found,
  *    using default load strategy: Full");
  *  - a `"*"` table entry is the wildcard fallback (star.port);
  *  - `$VAR` / `${VAR}` in any string value expands from the environment
  *    (≙ endpoint_configuration.go env interpolation, F7);
  *  - transform + castTo ≙ `TransformColumn(col, fn, "INTEGER")`
  *    (transform_column_and_change_type.port).
  */
/** `format`: parquet | csv | json (path-based) or `api` (endpoint-based —
  * ≙ the reference's `.port` endpoint DSL, endpoint_configuration.go:28-90:
  * Get/AddHeader/BasicAuth/ResponseType/Paginate map to the fields below;
  * `schema` ≙ TableDefinition, required when the destination doesn't exist
  * yet, api.go:101-137). */
case class SourceSpec(
    format: String,
    path: String = "",
    url: String = "", // may contain {offset}-style tokens (api.go:196-200)
    method: String = "GET",
    headers: Map[String, String] = Map.empty,
    basicAuthUser: Option[String] = None,
    basicAuthPassword: Option[String] = None,
    responseType: String = "json", // json | csv (api.go:461-477)
    itemsField: String = "items",
    offsetField: String = "offset",
    retryOn4xx: Boolean = false,
    pagesPerBatch: Int = 100,
    schema: Option[String] = None) // "name:type,..." ≙ TableDefinition
case class DestinationSpec(root: String, numBuckets: Int = 16)
case class TableExtractSpec(
    loadStrategy: String = "Full",
    primaryKey: Seq[String] = Nil,
    modifiedAtColumn: Option[String] = None,
    goBackHours: Int = 0,
    columns: Seq[String] = Seq("*"),
    transforms: Seq[ColumnSpec] = Nil,
    computed: Seq[ComputedSpec] = Nil,
    schedule: Option[String] = None) // "every 10 minutes" DSL (schedule.go:22-76)
case class JobSpec(
    source: SourceSpec,
    destination: DestinationSpec,
    tables: Map[String, TableExtractSpec] = Map.empty) {

  /** Resolve the extract config for `table`: exact entry, else `"*"`
    * wildcard, else default Full — exactly
    * readTableExtractConfiguration (database_configuration.go:125-152). */
  def extractFor(table: String): TableExtractSpec =
    tables.getOrElse(table, tables.getOrElse("*", TableExtractSpec()))
}

object JobSpec {
  implicit private val formats: Formats = DefaultFormats

  /** `$VAR` / `${VAR}` environment interpolation over the raw spec text
    * (≙ the reference's endpoint env expansion, F7). Unset vars expand to
    * the empty string, like os.ExpandEnv. Substitution happens inside a
    * JSON document (almost always inside a quoted string), so the value is
    * JSON-string-escaped: a password containing `"` or `\` must arrive in
    * the parsed spec intact, not corrupt the document — or worse, splice
    * crafted text into sibling fields. */
  def interpolate(raw: String, env: String => Option[String]): String = {
    val re = "\\$\\{([A-Za-z_][A-Za-z0-9_]*)\\}|\\$([A-Za-z_][A-Za-z0-9_]*)".r
    re.replaceAllIn(raw, m => {
      val name = Option(m.group(1)).getOrElse(m.group(2))
      val v = env(name).getOrElse("")
      val escaped = v.flatMap {
        case '\\' => "\\\\"
        case '"' => "\\\""
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < 0x20 => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      scala.util.matching.Regex.quoteReplacement(escaped)
    })
  }

  def parse(json: String, env: String => Option[String] = sys.env.get): JobSpec =
    JsonMethods.parse(interpolate(json, env)).extract[JobSpec]

  /** Load a spec file through the Hadoop FS API (spec files live next to the
    * data — local in tests, HDFS/object store on a cluster). `env` feeds
    * `$VAR` interpolation; pass [[Secrets.envWith]] to overlay decrypted
    * secrets the way the reference exposes them to config scripts. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String,
      env: String => Option[String] = sys.env.get): JobSpec = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    parse(graft.lake.LakeTable.readString(fs, p), env)
  }
}
