package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-6 optimization harness (guide §1): per-query isolation with the
  * noop sink (times the computation, not the sink or a count's column
  * pruning), `.explain("formatted")` dumps for the plan evidence in
  * `plans/r06/`, and labeled jobs. SEPARATE from [[Bench]] — the driver's
  * bench contract is frozen; this main only produces the builder's own
  * measurement evidence cited in OPTIMIZATION_r06.md.
  *
  * Usage: sbt "runMain graft.BenchExtra [tag] [query ...]"
  *   tag      suffix for the plan files (default "before")
  *   queries  default: the 8 bench-headline queries
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, GRAFT_BENCH_QUERY_REPS.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val tag = args.headOption.getOrElse("before")
    val names: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "j2_join_agg", "w1_top_per_group", "dedup_exact",
        "dedup_minhash_lsh", "text_langid", "ann_topk_cosine", "cdc_replay_state")
    val reps = math.max(1, sys.env.getOrElse("GRAFT_BENCH_QUERY_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000000")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "24g")
      .config("spark.local.dir", Bench.fastTmp)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = Paths.get("plans/r06")
    Files.createDirectories(outDir)
    val results = names.map { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name — known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      // plan dump from a fresh construction (cdc queries build a scratch
      // table as a side effect; the dumped plan is the returned read)
      val planDf = fn(spark, sfDir)
      Files.writeString(outDir.resolve(s"${name}_$tag.txt"),
        planDf.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      val samples = (1 to reps).map { i =>
        val (sec, steal) = Bench.withSteal {
          spark.sparkContext.setJobDescription(s"$name rep $i")
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        System.err.println(f"[bench-extra] $name rep $i: $sec%.2fs (steal $steal%.1f%%)")
        sec
      }
      val med = samples.sorted.apply(reps / 2)
      name -> (med, samples)
    }
    val json = results.map { case (k, (med, s)) =>
      "\"" + k + "\":{\"median\":" + f"$med%.3f" + ",\"runs\":" +
        s.map(x => f"$x%.3f").mkString("[", ",", "]") + "}"
    }.mkString("{", ",", "}")
    println(s"""{"bench_extra":"$tag","sf":"$sfDir","queries":$json}""")
    spark.stop()
  }
}
