package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `Array[Float]` column: brute-force
  * exact top-k as the correctness baseline, LSH-bucketed and IVF-style
  * variants as the scale path. All vector math is `zip_with`/`aggregate`
  * (Catalyst higher-order functions — codegen'd, no UDF, no RDD).
  */
object SimilarityOps {

  /** Sequential-fold dot product (deterministic summation order — the DuckDB
    * oracle folds in the same order, so doubles match bit-for-bit). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. The bare
    * division yields NaN there, and Spark ranks NaN ABOVE every real double
    * in both `desc` ordering and `>=` filters — one all-zero embedding
    * (padding row, empty document) would otherwise surface as the #1
    * neighbor of EVERY query and pass every near-dup threshold. (The gate
    * corpora contain no zero vectors, so the oracle's unguarded formula
    * stays value-identical.) */
  def cosine(a: Column, b: Column): Column = {
    val den = norm(a) * norm(b)
    when(den === 0.0, lit(0.0)).otherwise(dot(a, b) / den)
  }

  /** [[cosine]] with the two norms already materialized as columns. Higher-
    * order array functions are CodegenFallback (interpreted, no common-
    * subexpression elimination), so the inline [[cosine]] evaluates ~5 O(d)
    * array folds PER PAIR (dot + 2 norms for the zero guard + 2 again for
    * the division). Every pairwise operator below joins a row against many
    * counterparts, so each side's norm is a pure per-ROW value recomputed
    * per PAIR — precomputing it on each side before the join leaves exactly
    * one O(d) fold (the dot) per pair. Same expressions over the same data
    * in the same order → bit-identical doubles (asserted by the unchanged
    * oracle gate). */
  private def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column = {
    val den = na * nb
    when(den === 0.0, lit(0.0)).otherwise(dot(a, b) / den)
  }

  /** Bounded top-k per query: window `row_number ≤ k` over (cos desc, id) —
    * WindowExec external-sorts and spills, so per-task memory stays O(page)
    * no matter how many candidates a query has. (A per-group
    * `collect_list`+`array_sort` materializes one array of the entire
    * candidate set per query — a single-task OOM at 10⁹ corpus vectors.) */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
  }

  /** Exact top-k nearest neighbors by cosine for each query vector.
    * `queries` and `corpus` both carry (id, vec). Brute force: broadcast the
    * (small) query side against the corpus — the corpus is never shuffled,
    * each executor streams its partition once; at 100 TB this is the
    * scan-bound baseline that the bucketed variant is measured against.
    * Ties broken by neighbor id for determinism.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      norm(col("embedding")).as("_qn")))
    val scored = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        norm(col("embedding")).as("_cn"))
      .join(q, col("query_id") =!= col("neighbor_id")) // all query×corpus pairs minus self
      .withColumn("cos", cosinePre(col("qv"), col("cv"), col("_qn"), col("_cn")))
    topKPerQuery(scored, k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane m,
    * dimension d) in [-1, 1] — pure 64-bit integer arithmetic with no
    * overflow, so ANY SQL engine reproduces it exactly (the DuckDB oracle
    * does). The seed is SQUARED mod p before the two LCG steps: LCG steps
    * compose affinely, so without the quadratic the stride between
    * consecutive dimensions (and between planes) would be a constant
    * a²·Δseed mod p — an arithmetic-progression lattice whose planes are
    * pointwise translates of each other, skewing the LSH sign bits.
    * Squaring makes consecutive seeds differ by 2s+1 (seed-dependent), which
    * breaks the lattice; s < 2³¹ keeps s² < 2⁶² inside int64 in both
    * engines. */
  private def planeComponent(m: Int, d: Column, seed: Long): Column = {
    val p = 2147483647L // 2^31 - 1 (MINSTD modulus)
    val a = 48271L
    val s = pmod(lit(m.toLong * 4099L + seed) + d.cast("long"), lit(p))
    val sq = pmod(s * s, lit(p))
    val h1 = pmod(lit(a) * sq + lit(12345L), lit(p))
    val h2 = pmod(lit(a) * h1 + lit(12345L), lit(p))
    (pmod(h2, lit(2000001L)) - lit(1000000L)).cast("double") / 1000000.0
  }

  /** Largest vector dimension the precomputed plane literals cover — any
    * practical embedding is far below it; larger vectors fail loudly. */
  private[graft] val MaxPlaneDim = 4096

  /** Driver-side value of [[planeComponent]] — the SAME pure int64
    * arithmetic evaluated eagerly (`Math.floorMod` ≡ `pmod` for the
    * positive moduli used; the final int→double divide is the identical
    * IEEE operation), so the literal plane matrix below is bit-equal to
    * the expression form the DuckDB oracle replays. OperatorsSpec asserts
    * the two agree on a (plane, dim, seed) grid. */
  private[graft] def planeComponentValue(m: Int, d: Int, seed: Long): Double = {
    val p = 2147483647L
    val a = 48271L
    val s = Math.floorMod(m.toLong * 4099L + seed + d.toLong, p)
    val sq = Math.floorMod(s * s, p)
    val h1 = Math.floorMod(a * sq + 12345L, p)
    val h2 = Math.floorMod(a * h1 + 12345L, p)
    (Math.floorMod(h2, 2000001L) - 1000000L).toDouble / 1000000.0
  }

  /** The expression-form [[planeComponent]], exposed for the OperatorsSpec
    * literal-vs-expression equality grid — the production path below uses
    * the precomputed literals. */
  private[graft] def planeComponentExpr(m: Int, d: Column, seed: Long): Column =
    planeComponent(m, d, seed)

  /** Random-hyperplane LSH bucket id: sign bits of `planes` pseudo-random
    * hyperplane projections. Plane m's component for dimension d is a
    * deterministic hash-derived value in [-1, 1] — no stored model, any
    * executor regenerates it, and the same formula is reproducible in SQL.
    *
    * Round 6: the plane components are pure functions of (plane, dim, seed)
    * — constants across rows — yet the expression form re-evaluated the
    * ~12-op MINSTD chain (four modulo divisions) per element per plane per
    * ROW, interpreted. Each plane's component vector is now a constant-
    * folded LITERAL array ([[planeComponentValue]], bit-equal by
    * construction and by test); per element the projection does one array
    * read and one multiply. Sum order, products, sign logic and the
    * empty/null-vector outcomes are unchanged (empty → every projection
    * non-positive either way → bucket 0; null → null). */
  def lshBucket(vec: Column, planes: Int, seed: Long = 7L): Column = {
    // JVM shifts wrap mod 64: shiftleft(1L, 64) == 1L, so plane 64 would
    // silently alias plane 0's bit and corrupt bucket ids (same guard as
    // sigBands) — 63 planes max keeps every bit distinct in one Long
    require(planes >= 1 && planes <= 63,
      s"lshBucket needs planes in [1, 63] (bits of one Long), got $planes")
    val proj = (m: Int) => {
      val arr = lit((0 until MaxPlaneDim).map(d => planeComponentValue(m, d, seed)).toArray)
      aggregate(
        zip_with(vec, slice(arr, lit(1), size(vec)), (v, c) => v.cast("double") * c),
        lit(0.0), (acc, v) => acc + v)
    }
    val bucket = (0 until planes).map(m =>
      when(proj(m) > 0, shiftleft(lit(1L), m)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    // data-dependent guard (a compile-time require cannot see the dim):
    // beyond-MaxPlaneDim vectors would silently project over a TRUNCATED
    // plane — fail loudly instead
    when(size(vec) > MaxPlaneDim, raise_error(lit(
      s"lshBucket supports vectors up to $MaxPlaneDim dimensions " +
      "(raise SimilarityOps.MaxPlaneDim for wider embeddings)")).cast("long"))
      .otherwise(bucket)
  }

  /** Approximate NN: candidates share an LSH bucket (queries probe their own
    * bucket), exact cosine re-rank within bucket. The shuffle is keyed by
    * bucket — O(n) not O(n²); recall tunes with `planes` (fewer planes →
    * bigger buckets → higher recall, more compute). Top-k is a spilling
    * window, so even a hot bucket never materializes its candidate list.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, planes: Int = 8): DataFrame = {
    val cb = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      lshBucket(col("embedding"), planes).as("bucket"),
      norm(col("embedding")).as("_cn"))
    val qb = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      lshBucket(col("embedding"), planes).as("bucket"),
      norm(col("embedding")).as("_qn")))
    val scored = cb.join(qb, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosinePre(col("qv"), col("cv"), col("_qn"), col("_cn")))
    topKPerQuery(scored, k)
  }

  /** Quantize a float vector to `round(x·10⁶)` BIGINTs — the domain where
    * k-means centroid accumulation is EXACT integer arithmetic (order-free,
    * so any engine reproduces it bit-for-bit; float sums would depend on
    * aggregation order). */
  private def quantized(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 1000000).cast("long"))

  /** Lloyd k-means for the IVF coarse quantizer over quantized vectors.
    * Centroids are kept as (cid, component-SUM vector): cosine against the
    * sum equals cosine against the mean (the count divides out), so
    * centroids are never divided — no float-division nondeterminism anywhere
    * in the loop. Seeds = the first `nlist` vectors by id; ties → min cid;
    * empty clusters keep their previous centroid; `iters = 0` degrades to
    * the seeded centroids. Assignment is the classic corpus × nlist
    * broadcast-join scan per iteration; the centroid table itself is a
    * driver-scale object (nlist × dim longs — coarse quantizers always are).
    * The DuckDB oracle replays the identical iterations
    * ([[graft.SparkEntry]] ivfOracleSql); dot products of the quantized
    * values stay inside the 2⁵³ exact-integer range of doubles, and the
    * residual sqrt/divide are IEEE-deterministic.
    */
  /** Deterministic training-sample predicate: one MINSTD step over the id,
    * pure int64 arithmetic — both the Spark plan and the SQL oracle compute
    * the identical bit pattern (a float `rand()` or an engine-specific hash
    * could not be replayed). The id is pre-reduced mod 2³¹−1 so the product
    * stays ≤ 48271·(2³¹−2) ≈ 1.04e14 — inside int64 for ANY id (a bare
    * 48271·id overflows Long for id ≳ 1.9e14, where Spark wraps silently but
    * DuckDB raises, desyncing engine and oracle). Selects ~1/mod of ids. */
  private[graft] def trainSamplePredicate(id: Column, mod: Int): Column =
    pmod(pmod(lit(48271L) * pmod(id, lit(2147483647L)) + lit(12345L),
      lit(2147483647L)), lit(mod)) === 0

  /** Default training-sample modulus for a corpus of `corpusSize` vectors:
    * target ~256·nlist training points (the faiss convention — centroid
    * quality needs a representative sample, not the corpus). Small corpora
    * derive 1 (train on everything); a 10⁹-vector corpus at nlist=1024
    * derives ~3800 — each Lloyd iteration scans ~0.03% of it. */
  private[graft] def derivedTrainSampleMod(corpusSize: Long, nlist: Int): Int =
    math.min(math.max(1L, corpusSize / (256L * math.max(1, nlist))), Int.MaxValue.toLong).toInt

  /** Rank the (broadcast) centroid set per row by quantized cosine — ties →
    * min cid — and keep the `take` nearest. THE one argmax-centroid
    * definition, shared by the k-means trainer's assignment step, the
    * corpus→inverted-list assignment, and the query probes: a tie-break or
    * formula change in one place can no longer silently diverge the
    * quantizer from either assignment side. `df` must carry `idCol` and the
    * quantized vector as `vq`; `cent` is `(cid, csum)`. Adds `cid`, drops
    * the ranking internals. */
  private def nearestCentroids(df: DataFrame, cent: DataFrame, idCol: String,
      take: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("cos_c").desc, col("cid").asc)
    // norms hoisted out of the row × centroid product (see [[cosinePre]]):
    // the row's norm is computed once instead of per centroid, the
    // centroid's once per (tiny, broadcast) centroid row instead of per
    // corpus row × centroid
    df.withColumn("_vqn", norm(col("vq")))
      .join(cent.withColumn("_csn", norm(col("csum"))))
      .withColumn("cos_c", cosinePre(col("vq"), col("csum"), col("_vqn"), col("_csn")))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= take)
      .drop("cos_c", "_rn", "csum", "_vqn", "_csn")
  }

  /** @param trainSampleMod train the quantizer on the deterministic
    *        ~1/trainSampleMod id-hash sample ([[trainSamplePredicate]]);
    *        1 = full corpus. Centroid QUALITY needs only a representative
    *        sample (the standard IVF practice — faiss trains on ≤256·nlist
    *        points), so this cuts each Lloyd iteration's scan from
    *        O(corpus × nlist) to O(corpus/mod × nlist); the full corpus is
    *        assigned to lists exactly once, after training. */
  private[graft] def kmeansSums(corpus: DataFrame, nlist: Int, iters: Int,
      trainSampleMod: Int = 1): Seq[(Long, Seq[Long])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vqAll = corpus.select(col("vec_id"), quantized(col("embedding")).as("vq"))
    val vq =
      if (trainSampleMod <= 1) vqAll
      else vqAll.filter(trainSamplePredicate(col("vec_id"), trainSampleMod))
    // seeds: first nlist SAMPLE vectors by id (= the old first-nlist-ids rule
    // when the sample is the whole corpus and ids are dense)
    var cents: Seq[(Long, Seq[Long])] = vq
      .orderBy("vec_id").limit(nlist).as[(Long, Seq[Long])].collect().toSeq
    // an over-aggressive trainSampleMod (larger than the id space) selects
    // zero training vectors; unchecked, empty centroids flow through every
    // iteration and ivfTopK returns ZERO rows for every query — silent total
    // data loss instead of a config error
    require(cents.nonEmpty,
      s"IVF training set is empty — the corpus has no vectors, or " +
      s"trainSampleMod=$trainSampleMod selects none of them; lower it or pass 1")
    for (_ <- 0 until iters) {
      val cdf = broadcast(cents.toDF("cid", "csum"))
      val assigned = nearestCentroids(vq, cdf, "vec_id", take = 1)
      val sums = assigned
        .select(col("cid"), posexplode(col("vq")).as(Seq("d", "x")))
        .groupBy("cid", "d").agg(sum("x").as("s")) // exact BIGINT sums
        .collect().groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
        }
      cents = cents.map { case (cid, old) => (cid, sums.getOrElse(cid, old)) }
    }
    cents
  }

  /** IVF-style ANN: a coarse quantizer partitions the corpus into inverted
    * lists keyed by nearest-centroid id; each query probes only its `nprobe`
    * nearest lists and exact-re-ranks those candidates — the classic
    * scan-fraction trade (nprobe/nlist of the data per query), with the
    * inverted-list id as the ONLY shuffle key. Centroids come from
    * [[kmeansSums]] (quantized Lloyd iterations, `kmeansIters = 0` falls
    * back to the seeded first-`nlist` vectors); the final re-rank uses the
    * ORIGINAL float vectors — quantization only shapes the partitioning.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, kmeansIters: Int = 2,
      trainSampleMod: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // trainSampleMod = 0 (the default) derives the faiss-convention sample
    // size from the corpus count — metadata-only on a bare parquet scan,
    // but a FULL extra pass when `corpus` is a derived plan (filter/join):
    // such callers should cache the corpus or pass an explicit mod ≥ 1
    // (which also lets the gate's oracle replay, pinned at 2 there). Either
    // way the cost is amortized by the kmeansIters × corpus/mod training
    // scans the derived mod bounds.
    val mod =
      if (trainSampleMod >= 1) trainSampleMod
      else derivedTrainSampleMod(corpus.count(), nlist)
    val cent = broadcast(
      kmeansSums(corpus, nlist, kmeansIters, mod).toDF("cid", "csum"))
    // corpus → inverted lists: argmax-cosine centroid per vector (ties → min cid)
    val lists = nearestCentroids(
      corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        quantized(col("embedding")).as("vq")),
      cent, "neighbor_id", take = 1)
      .select(col("neighbor_id"), col("cv"), col("cid").as("list_id"))
    // queries → nprobe nearest lists each
    val probes = broadcast(nearestCentroids(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        quantized(col("embedding")).as("vq")),
      cent, "query_id", take = nprobe)
      .select(col("query_id"), col("qv"), col("cid").as("list_id")))
    val scored = lists.withColumn("_cn", norm(col("cv")))
      .join(probes.withColumn("_qn", norm(col("qv"))), Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosinePre(col("qv"), col("cv"), col("_qn"), col("_cn")))
    topKPerQuery(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold) via
    * LSH blocking + exact verify — the embedding flavor of DedupOps. */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double, planes: Int = 6): DataFrame = {
    val b = vectors.select(col("vec_id").as("id"), col("embedding").as("v"),
      lshBucket(col("embedding"), planes).as("bucket"),
      norm(col("embedding")).as("vn"))
    // shuffle_hash: a broadcast of one self-join side would re-run the
    // whole lshBucket + norm projection for it; hashed both sides,
    // ReuseExchange computes it once (same rationale as the banded dedup
    // self-joins in [[DedupOps]])
    b.as("l").join(b.as("r").hint("shuffle_hash"),
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .withColumn("cos", cosinePre(col("l.v"), col("r.v"), col("l.vn"), col("r.vn")))
      .filter(col("cos") >= threshold)
      .select(col("l.id").as("a"), col("r.id").as("b"), col("cos"))
  }
}
