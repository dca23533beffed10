package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** `yaml.loads` parity (reference starlarkextensions.go:21-28, exercised by
  * testdata/databases/deserialize_ruby_yaml_column.port): parse a YAML
  * document column and re-emit it as JSON so the existing `dig` path
  * (`get_json_object`) works on the result. Ruby-serialized YAML (the
  * fixture's shape: `!ruby/hash-with-ivars:...`, `!ruby/object:Set` tags) is
  * handled by stripping the non-standard ruby tags before parsing — the same
  * surgery the fixture's own Starlark does by slicing the document.
  *
  * A Scala UDF, deliberately: YAML parsing is a config-column transform (the
  * reference runs it row-at-a-time in Starlark), never a hot-path analytic —
  * snakeyaml (on Spark's classpath) + Jackson beat hand-rolling a parser.
  */
object YamlFunctions {

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private[functions] def yamlToJsonStr(y: String): String = {
    if (y == null) return null
    // ruby tag surgery: "--- !ruby/hash-with-ivars:Klass" → "---";
    // "x: !ruby/object:Set ..." → untagged node
    val cleaned = y.replaceAll("!ruby/\\S*", "")
    val opts = new org.yaml.snakeyaml.LoaderOptions()
    val yaml = new org.yaml.snakeyaml.Yaml(
      new org.yaml.snakeyaml.constructor.SafeConstructor(opts))
    val parsed = yaml.load[Object](cleaned)
    mapper.writeValueAsString(parsed)
  }

  /** Column form: YAML text → JSON text (null-safe). */
  def yamlToJson(c: Column): Column = {
    val f = udf((s: String) => yamlToJsonStr(s))
    f(c)
  }

  /** Register the SQL-callable form — `yaml_to_json(col)` — so computed
    * columns (ComputedSpec SQL, `.port`-translated lambdas) can call it.
    * Idempotent per session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("yaml_to_json", (s: String) => yamlToJsonStr(s))
}
