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

  // per-thread parser + precompiled tag pattern: snakeyaml's Yaml is
  // reusable but not thread-safe, and building a parser object graph (and
  // recompiling the regex via String.replaceAll) PER ROW was pure overhead
  // in the package's one non-codegen function
  // only strip tags in TAG POSITION (document start, after `key: `, or a
  // `- ` sequence item) — a bare `!ruby/\S*` pattern also mutated quoted
  // scalar VALUES that merely mention a ruby tag ("see !ruby/object:Set
  // docs" lost its substring). A plain scalar cannot START with '!' in
  // YAML, so anything matched here really is a node tag. Residual
  // limitation (documented): a tag-looking string directly after `: `
  // INSIDE a quoted value is still stripped — regexes cannot see quote
  // context, and the fixture corpus never hits it.
  @transient private lazy val rubyTag =
    java.util.regex.Pattern.compile("(?m)(^---\\s*|:\\s+|-\\s+|^)!ruby/\\S*")
  @transient private lazy val yamlTL: ThreadLocal[org.yaml.snakeyaml.Yaml] =
    ThreadLocal.withInitial { () =>
      new org.yaml.snakeyaml.Yaml(
        new org.yaml.snakeyaml.constructor.SafeConstructor(
          new org.yaml.snakeyaml.LoaderOptions()))
    }

  private[functions] def yamlToJsonStr(y: String): String = {
    if (y == null) return null
    // ruby tag surgery: "--- !ruby/hash-with-ivars:Klass" → "---";
    // "x: !ruby/object:Set ..." → untagged node
    val cleaned = rubyTag.matcher(y).replaceAll("$1")
    val parsed = yamlTL.get().load[Object](cleaned)
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
