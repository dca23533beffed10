package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.cdc.CdcPipeline
import graft.lake.LakeTable
import graft.model.SyntheticEvents

/** Dev profiler: one CDC merge batch with per-stage task-time breakdown. */
object MergeProfiler {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("GRAFT_BENCH_EVENTS", "500000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000000")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "24g")
      .config("spark.local.dir", graft.Bench.fastTmp)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val cpu = si.taskMetrics.executorRunTime / 1e3
        val realCpu = si.taskMetrics.executorCpuTime / 1e9
        println(f"[stage] id=${si.stageId}%-3d tasks=${si.numTasks}%-4d wall=$wall%6.2fs " +
          f"run=$cpu%7.2fs cpu=$realCpu%7.2fs gc=${si.taskMetrics.jvmGCTime / 1e3}%6.2fs " +
          f"spill=${si.taskMetrics.memoryBytesSpilled / 1e6}%6.1fMB " +
          f"shufW=${si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB " +
          f"shufR=${si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fMB  ${si.name.take(40)}")
      }
    })
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(graft.Bench.fastTmp), "prof").toString
    val p = new CdcPipeline(LakeTable(s"$root/t")(spark), "prof", lineage = false,
      mergeOnRead = sys.env.contains("GRAFT_PROF_MOR"))
    p.bootstrap(numBuckets = 128)
    SyntheticEvents.generate(spark, n, nRepos = 2000, filesPerRepo = 500)
      .repartitionByRange(8, org.apache.spark.sql.functions.col("lsn"))
      .write.mode("overwrite").parquet(s"$root/ev")
    val ev = spark.read.parquet(s"$root/ev")
    println("=== batch 0 (bootstrap-ish, empty target) ===")
    val t0 = System.nanoTime()
    p.applyBatch(ev.filter(org.apache.spark.sql.functions.col("lsn") < n / 2), 0)
    println(f"batch0 total ${(System.nanoTime() - t0) / 1e9}%.2fs")
    println("=== batch 1 (against populated target) ===")
    val t1 = System.nanoTime()
    p.applyBatch(ev.filter(org.apache.spark.sql.functions.col("lsn") >= n / 2), 1)
    println(f"batch1 total ${(System.nanoTime() - t1) / 1e9}%.2fs")
    spark.stop()
  }
}
