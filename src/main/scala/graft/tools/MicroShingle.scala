package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway microbench: is the multi-referenced `toks` split inside
  * [[graft.operators.DedupOps.shingles]]' transform lambda re-evaluated per
  * gram (quadratic in document length) in interpreted HOF eval? Long
  * synthetic docs make the asymptotic term dominate. Not part of any
  * deliverable; run via `runMain graft.tools.MicroShingle [tokens]`.
  */
object MicroShingle {
  def main(args: Array[String]): Unit = {
    val nTok = args.headOption.map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until nTok).map(i =>
        concat(lit("w"), pmod(col("id") * 131 + i, lit(5000)).cast("string"))): _*)
        .as("text"))
      .select(col("doc_id"), col("text")).cache()
    docs.count()
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = docs.select(col("doc_id"),
        explode(graft.operators.DedupOps.shingles(col("text"), 3)).as("sh"))
        .count()
      println(f"[micro] rep $rep: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n shingle rows, $nTok tokens/doc)")
    }
    docs.unpersist()
    spark.stop()
  }
}
