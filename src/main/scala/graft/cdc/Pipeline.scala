package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.{LakeTable, Snapshot}
import graft.model.CdcModel

/** Per-batch lineage records under `<root>/lineage/v<version>.json` (one
  * small JSON file per commit, written driver-side through the Hadoop
  * FileSystem API — object stores have no append, and a Spark job per
  * lineage row added ~0.5s of fixed cost to every micro-batch).
  * ≙ the reference's RowCounter/BytesCounter + per-step workflow logging
  * (/root/reference/workflow.go:100-136) promoted to a queryable table:
  * {source offset range, rows applied, conflicts resolved, bytes, duration}.
  * The commit version names the file, so a fenced/replayed batch that
  * re-reports the same commit is deduplicated by create-exclusive.
  */
object Lineage {
  val schema: StructType = StructType(Seq(
    StructField("batchId", LongType), StructField("version", LongType),
    StructField("eventsIn", LongType), StructField("distinctKeys", LongType),
    StructField("lwwConflicts", LongType), StructField("bucketsTouched", IntegerType),
    StructField("filesRewritten", IntegerType), StructField("rowsWritten", LongType),
    StructField("bytesWritten", LongType),
    StructField("minLsn", LongType), StructField("maxLsn", LongType),
    StructField("schemaEvolved", BooleanType), StructField("skippedFenced", BooleanType),
    StructField("durationMs", LongType),
    // per-source-partition offsets the batch advanced to (null in records
    // written before round 4) — batch provenance without snapshot history
    StructField("sourceOffsets", MapType(StringType, LongType))))

  def append(table: LakeTable, s: MergeStats): Unit = {
    val offsets = s.sourceOffsets.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        "\"" + k.replace("\\", "\\\\").replace("\"", "\\\"") + "\":" + v
      }.mkString("{", ",", "}")
    val json = s"""{"batchId":${s.batchId},"version":${s.committedVersion},""" +
      s""""eventsIn":${s.eventsIn},"distinctKeys":${s.distinctKeys},""" +
      s""""lwwConflicts":${s.lwwConflicts},"bucketsTouched":${s.bucketsTouched},""" +
      s""""filesRewritten":${s.filesRewritten},"rowsWritten":${s.rowsWritten},""" +
      s""""bytesWritten":${s.bytesWritten},""" +
      s""""minLsn":${s.minLsn},"maxLsn":${s.maxLsn},""" +
      s""""schemaEvolved":${s.schemaEvolved},"skippedFenced":${s.skippedFenced},""" +
      s""""durationMs":${s.durationMs},"sourceOffsets":$offsets}""" + "\n"
    val dir = new org.apache.hadoop.fs.Path(table.root, "lineage")
    table.fs.mkdirs(dir)
    LakeTable.writeStringExclusive(table.fs,
      new org.apache.hadoop.fs.Path(dir, s"v${s.committedVersion}.json"), json)
  }

  def read(spark: SparkSession, tableRoot: String): DataFrame = {
    val dir = new org.apache.hadoop.fs.Path(tableRoot, "lineage")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    // explicit file listing, not a glob: Spark's glob resolution was observed
    // to intermittently miss just-written files; listStatus is authoritative
    val files =
      if (!fs.isDirectory(dir)) Array.empty[String]
      else fs.listStatus(dir).collect {
        case st if st.isFile && st.getPath.getName.endsWith(".json") =>
          st.getPath.toString
      }
    if (files.isEmpty) // table has no lineage records (lineage=false)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).json(files.toIndexedSeq: _*)
  }
}

/** End-to-end CDC pipeline over a [[graft.lake.LakeTable]]: bootstrap
  * (≙ reference Full strategy), per-batch MERGE apply (≙ Incremental /
  * ModifiedOnly), and replay with checkpoint/fencing semantics.
  * This is the `foreachBatch` body used by [[graft.streaming.CdcStream]] and
  * callable directly for deterministic batch-mode replays.
  *
  * @param mergeOnRead append-only apply (O(batch) per batch; readers resolve
  *        LWW across file generations, [[Compaction]] folds them) vs
  *        copy-on-write (reads stay trivial). See [[Merge]].
  * @param compactEveryFiles in merge-on-read mode, fold any bucket whose file
  *        count exceeds this after a batch (0 disables auto-compaction).
  */
final class CdcPipeline(val table: LakeTable, val appId: String,
    lineage: Boolean = true, val mergeOnRead: Boolean = false,
    val compactEveryFiles: Int = 16) {

  /** Create the target table (snapshot 0) if absent. */
  def bootstrap(schema: StructType = CdcModel.targetSchema, numBuckets: Int = 64): Unit =
    if (!table.exists) table.create(schema, numBuckets, appId, CdcModel.KeyCols)

  /** Full-refresh from a complete dataset (reference Full strategy,
    * /root/reference/dialect.go:22-24): one overwrite snapshot. `df` must
    * have target payload columns; `_lsn` is set from `lsnCol` or 0.
    */
  def fullRefresh(df: DataFrame, asOfLsn: Long = 0L): Snapshot = {
    val withLsn =
      if (df.columns.contains(CdcModel.RowLsnCol)) df
      else df.withColumn(CdcModel.RowLsnCol, lit(asOfLsn))
    table.overwrite(withLsn, CdcModel.KeyCols, appId, watermarkLsn = asOfLsn)
  }

  /** Apply one micro-batch of change events. Idempotent per (appId, batchId).
    *
    * Optimistic concurrency (the Iceberg commit model): when another writer
    * (a second stream, a compaction daemon, a config load) publishes a
    * snapshot between this merge's snapshot read and its commit, the commit
    * CAS throws [[graft.lake.CommitConflictException]] — the merge then
    * RE-RUNS against the fresh snapshot instead of dying. Safe because the
    * whole apply is idempotent (fencing + LWW against stored `_lsn`); the
    * loser's staged data files are unreferenced and vacuum() collects them
    * (its grace window protects the retry in flight).
    */
  def applyBatch(events: DataFrame, batchId: Long,
      sourceOffsets: Map[String, Long] = Map.empty,
      orderedDelivery: Boolean = false,
      maxCommitRetries: Int = 5): MergeStats = {
    // retry wraps ONLY the merge: a conflict from the post-merge compaction
    // must never re-run an already-committed batch (it would re-append every
    // row as duplicate generations and double-count lineage) — maintenance
    // is best-effort and the next batch's auto-compaction check catches up
    var attempt = 0
    var stats: MergeStats = null
    while (stats == null) {
      try {
        stats = Merge(table, events, appId, batchId, sourceOffsets,
          orderedDelivery, mergeOnRead)
      } catch {
        case e: graft.lake.CommitConflictException if attempt < maxCommitRetries =>
          attempt += 1
          System.err.println(s"[cdc] commit conflict on batch $batchId " +
            s"(attempt $attempt/$maxCommitRetries), re-merging against the new snapshot: ${e.getMessage}")
      }
    }
    if (lineage) Lineage.append(table, stats)
    if (mergeOnRead && compactEveryFiles > 0 &&
        table.currentSnapshot.exists(_.files.groupBy(_.bucket).exists(_._2.size > compactEveryFiles)))
      try Compaction(table, horizonLsn = -1L, maxFilesPerBucket = compactEveryFiles)
      catch {
        case e: graft.lake.CommitConflictException =>
          System.err.println(s"[cdc] auto-compaction lost a commit race (skipped): ${e.getMessage}")
      }
    stats
  }

  /** Replay an event stream deterministically in `numBatches` LSN-range
    * micro-batches (batch-mode equivalent of Trigger.AvailableNow). Events
    * are split by LSN so any re-run partitions the stream identically —
    * the exactly-once replay property tests drive this.
    */
  def replay(events: DataFrame, numBatches: Int, startBatchId: Long = 0L): Seq[MergeStats] = {
    val bounds = events.agg(min(col(CdcModel.LsnCol)), max(col(CdcModel.LsnCol))).collect()(0)
    if (bounds.isNullAt(0)) return Nil
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (hi - lo + numBatches) / numBatches)
    (0 until numBatches).flatMap { i =>
      val (b0, b1) = (lo + i * width, lo + (i + 1) * width)
      val slice = events.filter(col(CdcModel.LsnCol) >= b0 && col(CdcModel.LsnCol) < b1)
      // LSN-range slices ascend, so ordered delivery holds and the watermark
      // fast-path may skip already-applied prefixes on re-runs; empty slices
      // still commit (fencing epoch advances uniformly)
      Some(applyBatch(slice, startBatchId + i, Map("replay" -> (b1 - 1)),
        orderedDelivery = true))
    }
  }

  /** Current target state: live rows only (tombstones filtered), internal
    * columns dropped. */
  def state(): DataFrame = CdcPipeline.liveState(table)
}

object CdcPipeline {
  /** Resolve LWW across file generations: one surviving row per key, ordered
    * by (_lsn, _deleted, content) — deterministic under duplicate appends
    * (a replayed event re-appended by a new batchId carries identical
    * content, so either copy wins identically). For copy-on-write tables
    * every key is already unique and the window passes rows through. */
  def resolved(table: LakeTable): DataFrame = {
    val df = table.read()
    if (!df.columns.contains(CdcModel.RowLsnCol)) return df
    // key columns from the manifest (recorded at create since round 3);
    // pre-round-3 manifests carry none → the CDC model's key
    val keys = table.currentSnapshot.map(_.keyCols.toSeq).filter(_.nonEmpty)
      .getOrElse(CdcModel.KeyCols)
    val tie =
      if (df.columns.contains("content")) coalesce(col("content"), lit(""))
      else lit("")
    val del =
      if (df.columns.contains(CdcModel.DeletedCol))
        coalesce(col(CdcModel.DeletedCol), lit(false))
      else lit(false)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(CdcModel.RowLsnCol).desc, del.cast("int").desc, tie.desc)
    df.withColumn("_gen_rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_gen_rn") === 1).drop("_gen_rn")
  }

  /** Live rows of a CDC target table: LWW-resolved across generations,
    * tombstones + internal columns removed. `_deleted` may be null in files
    * written before tombstone support or by fullRefresh — treated as live. */
  def liveState(table: LakeTable): DataFrame = {
    val df = resolved(table)
    val filtered =
      if (df.columns.contains(CdcModel.DeletedCol))
        df.filter(!coalesce(col(CdcModel.DeletedCol), lit(false))).drop(CdcModel.DeletedCol)
      else df
    filtered.drop(CdcModel.RowLsnCol)
  }
}
