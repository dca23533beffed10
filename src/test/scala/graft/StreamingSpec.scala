package graft

import org.apache.spark.sql.functions._

import graft.cdc.CdcPipeline
import graft.lake.LakeTable
import graft.model.DerivedEvents
import graft.streaming.{CdcStream, Schedule}

/** Structured-Streaming driver end-to-end: file-tail → foreachBatch MERGE →
  * final state equals the batch-mode replay of the same events (the streaming
  * and batch paths share one apply, so they must agree bit-for-bit). */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("streaming file-tail replay equals batch replay (exactly-once composition)") {
    val base = SparkTestBase.tmpDir("stream-e2e")
    val events = DerivedEvents.fromDocuments(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    // stage events as multiple files (out-of-order file discovery exercised)
    events.repartition(4).write.parquet(s"$base/events")

    val streamTable = LakeTable(s"$base/t-stream")(spark)
    val q = CdcStream.start(spark, s"$base/events", streamTable,
      s"$base/ckpt", "st-app", maxFilesPerTrigger = Some(2))
    q.awaitTermination()

    val batchTable = LakeTable(s"$base/t-batch")(spark)
    val p = new CdcPipeline(batchTable, "b-app")
    p.bootstrap(numBuckets = 64)
    p.replay(events, numBatches = 3)

    val s1 = CdcPipeline.liveState(streamTable)
      .select(col("repo"), col("path"), col("commit"), sha2(col("content"), 256))
    val s2 = CdcPipeline.liveState(batchTable)
      .select(col("repo"), col("path"), col("commit"), sha2(col("content"), 256))
    assert(s1.count() === s2.count())
    assert(s1.exceptAll(s2).count() === 0)
    assert(s2.exceptAll(s1).count() === 0)

    // restart with the same checkpoint: no new batches, state unchanged
    val v = streamTable.latestVersion
    val q2 = CdcStream.start(spark, s"$base/events", streamTable,
      s"$base/ckpt", "st-app", maxFilesPerTrigger = Some(2))
    q2.awaitTermination()
    assert(streamTable.latestVersion === v)
  }

  test("schedule DSL maps onto triggers") {
    assert(Schedule.trigger("every 5 minutes").toString.contains("300000"))
    assert(Schedule.drainTrigger.toString.toLowerCase.contains("availablenow"))
  }
}
