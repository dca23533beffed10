package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.Lineage
import graft.lake.LakeTable
import graft.model.{CdcModel, SyntheticEvents}
import graft.streaming.CdcStream

/** spark-submit-able CLI entry: tail a change-event directory into a
  * LakeTable with exactly-once semantics, or generate a synthetic stream
  * first and replay it (the reference's `teleport extract-load-*` CLI
  * reshaped, /root/reference/main.go:153-169).
  *
  * Usage:
  *   graft.Main gen <eventsDir> <numEvents> [numFiles]  — write a seeded event stream
  *   graft.Main replay <eventsDir> <tableRoot> <checkpointDir> [appId]
  *                                                      — drain it exactly-once
  *   graft.Main show <tableRoot>                        — final state + lineage summary
  *
  * On a cluster: `spark-submit --class graft.Main teleportspark.jar replay ...`
  * (master/parallelism come from spark-submit). Locally a session is created
  * at local[*].
  */
object Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-cdc")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS",
          Runtime.getRuntime.availableProcessors().toString))
      .master(sys.props.getOrElse("spark.master",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "*")}]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.toList) finally spark.stop()
  }

  private def run(spark: SparkSession, args: List[String]): Unit = args match {
    case "gen" :: dir :: n :: rest =>
      val files = rest.headOption.map(_.toInt).getOrElse(8)
      SyntheticEvents.generate(spark, n.toLong)
        .repartitionByRange(files, col(CdcModel.LsnCol))
        .write.mode("overwrite").parquet(dir)
      println(s"[gen] wrote ${n} events to $dir in $files lsn-ranged files")

    case "replay" :: eventsDir :: tableRoot :: checkpointDir :: rest =>
      val appId = rest.headOption.getOrElse("graft-cdc")
      val maxFiles = rest.drop(1).headOption.filter(_ != "mor").map(_.toInt)
      val mor = rest.contains("mor")
      val table = LakeTable(tableRoot)(spark)
      val t0 = System.nanoTime()
      val q = CdcStream.start(spark, eventsDir, table, checkpointDir, appId,
        maxFilesPerTrigger = maxFiles, mergeOnRead = mor)
      q.awaitTermination()
      val state = graft.cdc.CdcPipeline.liveState(table)
      val rows = state.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val applied = Lineage.read(spark, tableRoot)
        .agg(sum("eventsIn")).collect()(0).getLong(0)
      println(f"[replay] $applied events applied in $sec%.1fs " +
        f"(${applied / sec}%.0f events/s) → $rows rows at version ${table.latestVersion}")

    case "show" :: tableRoot :: Nil =>
      val table = LakeTable(tableRoot)(spark)
      val s = table.currentSnapshot.getOrElse(sys.error(s"no table at $tableRoot"))
      println(s"[show] version=${s.version} files=${s.files.size} " +
        s"rows=${s.files.map(_.rows).sum} watermarkLsn=${s.watermarkLsn} " +
        s"batchId=${s.batchId} offsets=${s.sourceOffsets}")
      table.read().drop(CdcModel.RowLsnCol)
        .withColumn("content_sha", sha2(col("content"), 256))
        .drop("content").show(5, truncate = false)
      Lineage.read(spark, tableRoot).orderBy("batchId").show(50, truncate = false)

    case "compact" :: tableRoot :: rest =>
      val horizon = rest.headOption.map(_.toLong).getOrElse(-1L)
      val n = graft.cdc.Compaction(LakeTable(tableRoot)(spark), horizon, "graft-maint")
      println(s"[compact] rewrote $n buckets (tombstone horizon=$horizon)")

    case "vacuum" :: tableRoot :: Nil =>
      val n = LakeTable(tableRoot)(spark).vacuum()
      println(s"[vacuum] removed $n unreferenced data files")

    case other =>
      System.err.println(s"unknown args: ${other.mkString(" ")}\n" +
        "usage: gen <dir> <n> [files] | replay <eventsDir> <tableRoot> <ckpt> [appId] [maxFiles] [mor] | " +
        "compact <tableRoot> [horizonLsn] | vacuum <tableRoot> | show <tableRoot>")
      sys.exit(2)
  }
}
