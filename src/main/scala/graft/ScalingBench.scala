package graft

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (BASELINE.md): runs the identical CDC
  * replay at N and 4N cores sequentially in one JVM (stop + recreate the
  * session — Spark allows serial contexts) and reports throughput at both
  * plus efficiency = (T_4N / T_N) / 4. Target ≥ 0.8.
  *
  * Env: GRAFT_SCALE_EVENTS (default 4,000,000), GRAFT_SCALE_BATCHES (8),
  *      GRAFT_SCALE_N (8 → compares local[8] vs local[32]).
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_SCALE_EVENTS", "4000000").toLong
    val batches = sys.env.getOrElse("GRAFT_SCALE_BATCHES", "8").toInt
    val small = sys.env.getOrElse("GRAFT_SCALE_N", "8").toInt
    val big = small * 4

    def run(cores: Int): (Double, Double) = {
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"graft-scaling-$cores")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000000")
        .config("spark.local.dir", Bench.fastTmp)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      // JVM/codegen warm-up at small scale so the timed run measures the
      // engine, not first-use class loading (identical for both sizes)
      Bench.cdcThroughput(spark, 100000L, 2)
      val r = Bench.cdcThroughput(spark, n, batches)
      spark.stop()
      // allow a fresh context afterwards
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      r
    }

    val (epsSmall, secSmall) = run(small)
    val (epsBig, secBig) = run(big)
    val eff = (epsBig / epsSmall) / (big.toDouble / small)
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio",""" +
      f""""n_cores":$small,"n4_cores":$big,"events":$n,"batches":$batches,""" +
      f""""events_per_sec_n":${epsSmall.round},"sec_n":$secSmall%.1f,""" +
      f""""events_per_sec_4n":${epsBig.round},"sec_4n":$secBig%.1f}""")
  }
}
