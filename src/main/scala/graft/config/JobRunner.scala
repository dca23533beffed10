package graft.config

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.LakeTable
import graft.operators.ColumnTransforms
import graft.sources.CsvSource

/** Executes a [[JobSpec]]: the reference's `teleport extract-load-db`
  * pipeline (extract → transform → staging → primary-table update,
  * /root/reference/database.go:131-220 + load.go:137-168) over Spark and a
  * [[LakeTable]] destination. The staging-table + transaction dance
  * collapses into the LakeTable's atomic snapshot commit.
  */
object JobRunner {

  case class Result(table: String, strategy: String, rowsLoaded: Long,
      version: Long, previewed: Boolean,
      mergeStats: Option[graft.cdc.MergeStats] = None)

  /** Run the extract-load for `table` under `spec`.
    *
    * @param preview reference `-preview` (main.go:29-33, load.go:80-83):
    *        print 3 rows and every step that WOULD run; no table create, no
    *        commit — the destination's version is untouched.
    */
  def run(spark: SparkSession, spec: JobSpec, table: String,
      preview: Boolean = false): Result = {
    val extract = spec.extractFor(table)
    val strategy = extract.loadStrategy
    val loaded = extractTable(spark, spec, table)

    if (preview) {
      println(s"[preview] $table strategy=$strategy — first 3 rows (not executed):")
      loaded.show(3, truncate = false)
      val dest = LakeTable(spec.destination.root)(spark)
      return Result(table, strategy, 0L,
        if (dest.exists) dest.latestVersion else -1L, previewed = true)
    }

    val dest = LakeTable(spec.destination.root)(spark)
    val keys = if (extract.primaryKey.nonEmpty) extract.primaryKey
      else loaded.columns.take(1).toSeq
    // destination auto-create (load.go:33-85): CREATE TABLE from the
    // extract's schema when absent
    if (!dest.exists) dest.create(loaded.schema, spec.destination.numBuckets, "extract-load")

    strategy match {
      case "Full" =>
        // FullLoadQuery ≙ truncate + insert: one overwrite snapshot.
        // Row count from the committed manifest (DataFile.rows) — the
        // extract is scanned exactly once.
        val snap = dest.overwrite(loaded, keys, "extract-load")
        Result(table, strategy, snap.files.map(_.rows).sum, snap.version,
          previewed = false)
      case "ModifiedOnly" | "Incremental" =>
        // ModifiedOnlyLoadQuery ≙ DELETE matching pk; INSERT staging
        // (dialect.go:26-29). The reference rewrites the whole primary table;
        // here the extract becomes a change batch (op='U', one LSN per load —
        // later loads beat earlier by LWW) applied through the engine's
        // bucket-pruned MERGE: only buckets the batch touches are read and
        // rewritten — O(touched buckets), not O(table), per load. The per-run
        // LSN is the destination's next version: strictly monotonic because
        // every load commits at least one snapshot.
        val runLsn = dest.latestVersion + 1
        val events = loaded
          .withColumn(graft.model.CdcModel.LsnCol, lit(runLsn))
          .withColumn(graft.model.CdcModel.OpCol, lit("U"))
        val stats = graft.cdc.Merge(dest, events, appId = "extract-load",
          batchId = -1L, keyCols = keys)
        graft.cdc.Lineage.append(dest, stats)
        Result(table, strategy, stats.eventsIn, stats.committedVersion,
          previewed = false, mergeStats = Some(stats))
    }
  }

  /** The extract side of the pipeline, shared by `run` and the CLI `extract`
    * verb (≙ `teleport extract-db`, which applies the SAME strategy filter as
    * extract-load, /root/reference/database.go:68-106 + 178-187): source read
    * → column projection → transform chain → strategy WHERE clause. */
  def extractTable(spark: SparkSession, spec: JobSpec, table: String): DataFrame = {
    val extract = spec.extractFor(table)
    val source = readSource(spark, spec.source)

    // column selection: '*' keeps everything (star.port), else project —
    // projection happens BEFORE transforms so pushdown reaches the scan
    val projected = extract.columns match {
      case Seq("*") | Nil => source
      case cols => source.select(cols.map(col): _*)
    }
    val transformed =
      ColumnTransforms(projected, extract.transforms, extract.computed)

    // strategy WHERE clause (database.go:178-187): ModifiedOnly filters to
    // the lookback window; the cutoff anchors to the data's max modified-at
    // (deterministic + replayable) rather than wall-clock now().
    // Incremental takes the extract as-is — "the source decides what's new"
    // (endpoint_configuration.go:214-217; at load time both strategies run
    // the same delete-match upsert, load.go:148).
    extract.loadStrategy match {
      case "ModifiedOnly" =>
        val mcol = extract.modifiedAtColumn.getOrElse(
          throw new IllegalArgumentException(s"ModifiedOnly needs modifiedAtColumn"))
        val cutoff = transformed.agg(
          (max(col(mcol)) - expr(s"INTERVAL ${extract.goBackHours} HOURS")).as("c"))
        transformed.join(broadcast(cutoff)).filter(col(mcol) > col("c")).drop("c")
      case "Full" | "Incremental" => transformed
      case other => throw new IllegalArgumentException(
        s"load strategy not implemented: $other") // ≙ database.go:185-186
    }
  }

  private def readSource(spark: SparkSession, s: SourceSpec): DataFrame =
    s.format match {
      case "parquet" => spark.read.parquet(s.path)
      case "csv" => // reference CSV rules: header, empty=NULL, RFC3339 ts
        spark.read.options(CsvSource.ReadOptions)
          .option("inferSchema", "true").csv(s.path)
      case "json" => spark.read.json(s.path)
      case other => throw new IllegalArgumentException(s"unknown source format: $other")
    }
}
