package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.CdcPipeline
import graft.lake.LakeTable
import graft.model.SyntheticEvents

/** Per-round benchmark: headline CDC MERGE-apply throughput (the
  * BASELINE.json metric) + per-query timings of representative operators.
  * Prints ONE JSON line (and mirrors it to `bench_last.json` in the cwd so
  * the result survives any log-prefixing wrapper). Scale knobs via env:
  *   SPARK_GRAFT_SF_DIR  input tables dir (default sf0.1)
  *   SPARK_GRAFT_CPUS    cores (default 4)
  *   GRAFT_BENCH_EVENTS  synthetic replay size (default 4,000,000)
  *   GRAFT_BENCH_BATCHES micro-batches for the replay (default 4 — 1M-row
  *     batches: the sustained-ingest shape; per-batch fixed cost ~1.5s would
  *     dominate smaller batches and measure scheduling, not merge work)
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // the JSON line below is machine-parsed: under a comma-decimal default
    // locale (de_DE, fr_FR, ...) Scala's f-interpolator would render 1,234
    // and break every consumer — pin the numeric locale for this main
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nEvents = sys.env.getOrElse("GRAFT_BENCH_EVENTS", "4000000").toLong
    val nBatches = sys.env.getOrElse("GRAFT_BENCH_BATCHES", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000000")
      .config("spark.memory.offHeap.enabled", "true") // 32 tasks x on-heap
      // Tungsten pages thrash G1 (measured 541s GC in one stage); execution
      // memory off-heap keeps the heap for codegen/objects only
      .config("spark.memory.offHeap.size", "24g")
      .config("spark.local.dir", Bench.fastTmp) // shuffle on tmpfs: this host's
      // disk sustains ~70MB/s buffered while 126G RAM is free; a real cluster
      // has local SSDs for shuffle, so tmpfs is the faithful stand-in
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warm-up with ONE FULL-SIZE batch: the first merge pays
    // classloading, JIT and codegen compilation that a long-running ingest
    // amortizes to zero, and the 1M-row batch shape exercises the exact
    // memory/spill paths the timed reps hit (a 100k warm-up left rep 1 a JIT
    // sample — 15.8k vs 92-108k ev/s in BENCH_r02). Best-of-N then spends
    // its samples on host weather, not first-use costs.
    cdcThroughput(spark, math.max(100000L, nEvents / nBatches), 1)

    // headline: synthetic CDC replay, LSN-ranged micro-batches. Best of two
    // runs: this host shows up to ~3x noisy-neighbor variance between
    // identical runs (BASELINE.md), so a single sample grades host weather,
    // not the engine; both samples are published in the JSON.
    val reps = math.max(1, sys.env.getOrElse("GRAFT_BENCH_REPS", "5").toInt) // median headline: odd count, robust to ~2 burst reps
    val runs = (1 to reps).map { i =>
      val (r, steal) = withSteal(cdcThroughput(spark, nEvents, nBatches))
      System.err.println(f"[bench] replay rep $i: ${r._1.round} events/s (steal ${steal}%.1f%%)")
      (r._1, r._2, steal)
    }
    // headline = MEDIAN of the reps (an unbiased statistic, consistent with
    // ScalingBench's median-of-pairs); every raw sample is published in
    // runs_events_per_sec (with kernel-reported hypervisor-steal% per rep)
    // and the max rides along as best_events_per_sec
    val sorted = runs.sortBy(_._1)
    // true median on an even rep count (mean of the middle two) — the upper-
    // middle sample would bias the headline HIGH on this 3x-variance host
    val (eps, cdcSec) =
      if (reps % 2 == 1) (sorted(reps / 2)._1, sorted(reps / 2)._2)
      else ((sorted(reps / 2 - 1)._1 + sorted(reps / 2)._1) / 2.0,
        (sorted(reps / 2 - 1)._2 + sorted(reps / 2)._2) / 2.0)
    val best = sorted.last._1

    // representative operator queries on the sf dir — MEDIAN of qreps
    // samples per query, every sample + its kernel-reported steal%
    // published. Round 4's single samples made 1.5-2.3x swings on this
    // 3x-variance host unattributable (regression vs weather); medians +
    // disclosed spread make per-operator deltas adjudicable.
    val qreps = math.max(1, sys.env.getOrElse("GRAFT_BENCH_QUERY_REPS", "3").toInt)
    val headline = Seq("q1_agg", "j2_join_agg", "w1_top_per_group",
      "dedup_exact", "dedup_minhash_lsh", "text_langid", "ann_topk_cosine",
      "cdc_replay_state")
    val results = headline.map { name =>
      val samples = (1 to qreps).map { i =>
        val (sec, steal) = withSteal {
          val t0 = System.nanoTime()
          try { SparkEntry.queries(name)(spark, sfDir).count() }
          catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
          (System.nanoTime() - t0) / 1e9
        }
        System.err.println(f"[bench] $name rep $i: $sec%.2fs (steal $steal%.1f%%)")
        (sec, steal)
      }
      // true median: mean of the two middle samples on an even rep count —
      // picking the upper-middle would bias the published numbers high on
      // this 3x-variance host
      val sortedSecs = samples.map(_._1).sorted
      val med =
        if (qreps % 2 == 1) sortedSecs(qreps / 2)
        else (sortedSecs(qreps / 2 - 1) + sortedSecs(qreps / 2)) / 2.0
      name -> (med, samples)
    }
    val qs = results.map { case (k, (med, _)) => "\"" + k + "\":" + f"$med%.3f" }
      .mkString("{", ",", "}")
    val qruns = results.map { case (k, (_, s)) =>
      "\"" + k + "\":" + s.map(x => f"${x._1}%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val qsteal = results.map { case (k, (_, s)) =>
      "\"" + k + "\":" + s.map(x => f"${x._2}%.1f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._2._1).sum + cdcSec
    val allRuns = runs.map(_._1.round).mkString("[", ",", "]")
    val allSteal = runs.map(r => f"${r._3}%.1f").mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""queries_runs":$qruns,"queries_steal_pct":$qsteal,""" +
      s""""cdc_replay":{"events":$nEvents,"batches":$nBatches,"sec":$cdcSec,""" +
      s""""events_per_sec":${eps.round},"best_events_per_sec":${best.round},""" +
      s""""runs_events_per_sec":$allRuns,"runs_steal_pct":$allSteal},""" +
      s""""cores":$cpus,"sf":"$sfDir"}"""
    println(json)
    Files.writeString(java.nio.file.Paths.get("bench_last.json"), json + "\n")
    spark.stop()
  }

  /** Replay `n` synthetic events into a fresh LakeTable in `batches`
    * micro-batches; returns (events/sec, elapsed seconds). Shared by Bench
    * and ScalingBench so both cluster sizes run the identical job.
    */
  /** Cumulative hypervisor-steal ticks from /proc/stat (field 8 of the
    * aggregate cpu line; USER_HZ=100). The delta across a measurement,
    * divided by elapsed×100×nCpus, is the fraction of machine capacity the
    * hypervisor took DURING that measurement — kernel-reported, so a
    * storm-throttled sample is attributed by data, not inference. */
  private[graft] def stealTicks(): Long = {
    val src = scala.io.Source.fromFile("/proc/stat")
    try {
      val f = src.getLines().next().trim.split("\\s+")
      if (f.length > 8) f(8).toLong else 0L
    } catch { case _: Exception => 0L } finally src.close()
  }

  /** Run `f`, returning (result, steal% of machine capacity during it). */
  private[graft] def withSteal[T](f: => T): (T, Double) = {
    val cpus = Runtime.getRuntime.availableProcessors()
    val s0 = stealTicks(); val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    val pct = (stealTicks() - s0) / (sec * 100.0 * cpus) * 100.0
    (r, pct)
  }

  /** tmpfs-backed scratch when available (shuffle + bench tables). */
  def fastTmp: String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base = if (java.nio.file.Files.isWritable(shm)) shm.resolve("graft-bench")
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    java.nio.file.Files.createDirectories(base)
    base.toString
  }

  /** @param eventFiles number of LSN-ranged event files; with
    *        spark.sql.files.maxPartitionBytes set high this bounds the scan
    *        stage's task count — [[ScalingBench]] uses it to emulate cluster
    *        size (executor task slots) inside one JVM. */
  def cdcThroughput(spark: SparkSession, n: Long, batches: Int,
      numBuckets: Int = 128, eventFiles: Int = 8): (Double, Double) = {
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get(fastTmp), "bench-cdc").toString
    // materialize the change stream as LSN-ranged parquet (untimed setup —
    // a real tail reads event files; generating rows is not merge work)
    // finally-scoped cleanup: the scratch tree is tmpfs (RAM) and multi-GB —
    // a failed rep (the require below, a merge exception) must not leak it
    // across processes and erode the memory headroom later reps depend on
    try {
      val eventsDir = s"$root/events"
      SyntheticEvents.generate(spark, n, nRepos = 2000, filesPerRepo = 500)
        .repartitionByRange(eventFiles, org.apache.spark.sql.functions.col("lsn"))
        .write.mode("overwrite").parquet(eventsDir)
      val events = spark.read.parquet(eventsDir)
      // merge-on-read: the sustained-throughput mode (O(batch) per batch with
      // periodic compaction folded into the timed run — the honest number)
      val p = new CdcPipeline(LakeTable(s"$root/table")(spark), "bench",
        mergeOnRead = true, compactEveryFiles = 8)
      p.bootstrap(numBuckets = numBuckets)
      val t0 = System.nanoTime()
      val stats = p.replay(events, numBatches = batches)
      // compaction now runs in the background — include the drain in the timed
      // window so the number still means "all work done" (the honest sustained
      // figure; mid-run compactions overlap the merges they used to serialize)
      p.awaitMaintenance()
      val sec = (System.nanoTime() - t0) / 1e9
      val applied = stats.map(_.eventsIn).sum
      require(applied == n, s"replay applied $applied of $n events")
      (n / sec, sec)
    } finally LakeTable.deleteRecursively(java.nio.file.Paths.get(root))
  }
}
