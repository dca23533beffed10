package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.{LakeTable, Snapshot}
import graft.model.CdcModel

/** Per-batch × per-bucket lineage, appended to `<root>/_lineage` as parquet.
  * ≙ the reference's RowCounter/BytesCounter + per-step workflow logging
  * (/root/reference/workflow.go:100-136) promoted to a queryable table:
  * {source offset range, rows applied, conflicts resolved, duration}.
  */
object Lineage {
  val schema: StructType = StructType(Seq(
    StructField("batchId", LongType), StructField("version", LongType),
    StructField("eventsIn", LongType), StructField("distinctKeys", LongType),
    StructField("lwwConflicts", LongType), StructField("bucketsTouched", IntegerType),
    StructField("filesRewritten", IntegerType), StructField("rowsWritten", LongType),
    StructField("minLsn", LongType), StructField("maxLsn", LongType),
    StructField("schemaEvolved", BooleanType), StructField("skippedFenced", BooleanType),
    StructField("durationMs", LongType)))

  def append(spark: SparkSession, tableRoot: String, s: MergeStats): Unit = {
    import spark.implicits._
    Seq(s).toDF().write.mode("append").parquet(s"$tableRoot/_lineage")
  }

  def read(spark: SparkSession, tableRoot: String): DataFrame =
    spark.read.parquet(s"$tableRoot/_lineage")
}

/** End-to-end CDC pipeline over a [[graft.lake.LakeTable]]: bootstrap
  * (≙ reference Full strategy), per-batch MERGE apply (≙ Incremental /
  * ModifiedOnly), and replay with checkpoint/fencing semantics.
  * This is the `foreachBatch` body used by [[graft.streaming.CdcStream]] and
  * callable directly for deterministic batch-mode replays.
  */
final class CdcPipeline(val table: LakeTable, val appId: String,
    lineage: Boolean = true) {

  /** Create the target table (snapshot 0) if absent. */
  def bootstrap(schema: StructType = CdcModel.targetSchema, numBuckets: Int = 64): Unit =
    if (!table.exists) table.create(schema, numBuckets, appId)

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

  /** Apply one micro-batch of change events. Idempotent per (appId, batchId). */
  def applyBatch(events: DataFrame, batchId: Long,
      sourceOffsets: Map[String, Long] = Map.empty,
      orderedDelivery: Boolean = false): MergeStats = {
    val stats = Merge(table, events, appId, batchId, sourceOffsets, orderedDelivery)
    if (lineage) Lineage.append(events.sparkSession, table.root, stats)
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
  /** Live rows of a CDC target table (tombstones + internal columns removed).
    * `_deleted` may be null in files written before tombstone support or by
    * fullRefresh — treated as live. */
  def liveState(table: LakeTable): DataFrame = {
    val df = table.read()
    val filtered =
      if (df.columns.contains(CdcModel.DeletedCol))
        df.filter(!coalesce(col(CdcModel.DeletedCol), lit(false))).drop(CdcModel.DeletedCol)
      else df
    filtered.drop(CdcModel.RowLsnCol)
  }
}
