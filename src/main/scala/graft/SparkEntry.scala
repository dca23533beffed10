package graft

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.{CdcFeed, CdcPipeline, Lineage}
import graft.functions.TextFunctions
import graft.lake.LakeTable
import graft.model.DerivedEvents
import graft.operators.{DedupOps, SimilarityOps}

/** Driver contract: every operator claimed in SURVEY.md §2 has a `queries`
  * entry; each SQL-expressible one has a DuckDB oracle in `oracleSql` with
  * IDENTICAL output column names and ORDER BY for deterministic compare.
  *
  * Decimal-cast discipline: double aggregations go through DecimalType so
  * Spark and DuckDB produce bit-identical results regardless of summation
  * order; outputs cast back to double.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scratch root for gate-query temp tables: tmpfs when available — the
    * CDC gate queries run the real engine into a throwaway LakeTable, and on
    * this host /tmp sustains ~70MB/s buffered (3-4x the wall time of the
    * same query on tmpfs); a real cluster would use local SSD scratch.
    * Every directory is deleted on JVM exit (deletion cannot happen at
    * query-function return — the returned DataFrame still reads lazily from
    * the scratch table): tmpfs is RAM, so leaked gate tables from repeated
    * verify/bench runs would otherwise accrete against the same memory
    * Spark's shuffle space uses. */
  private val scratchDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      scratchDirs.forEach { d =>
        try {
          Files.walk(d).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { try Files.deleteIfExists(p) catch { case _: java.io.IOException => () } })
        } catch { case _: java.io.IOException => () }
      }
    }, "graft-scratch-cleanup"))
  }
  private def scratch(prefix: String): String = {
    val d = Files.createTempDirectory(java.nio.file.Paths.get(Bench.fastTmp), prefix)
    scratchDirs.add(d)
    d.toString
  }

  /** Flagship: full CDC replay on sf0.001 (driver smoke-checks rows>0). */
  def entry(spark: SparkSession): DataFrame =
    cdcReplayState(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- CDC ----

  private def derivedEvents(spark: SparkSession, dir: String): DataFrame =
    DerivedEvents.fromDocuments(t(spark, dir, "documents"))

  /** Run the real engine end-to-end: bootstrap an empty LakeTable, replay the
    * derived event stream in 4 LSN-range micro-batches, read back final live
    * state. The oracle recomputes the same final state as one window query.
    */
  private def cdcReplayState(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("gate-cdc-replay")
    val p = new CdcPipeline(LakeTable(root)(spark), "gate", lineage = false)
    p.bootstrap(numBuckets = 16)
    p.replay(derivedEvents(spark, dir), numBatches = 4)
    p.state()
      .select(col("repo"), col("path"), col("commit"), col("lang"),
        sha2(col("content"), 256).as("content_sha"))
      .orderBy("repo", "path", "commit")
  }

  /** Regression gate for the rebucket fold: replay into a FRAGMENTED
    * merge-on-read table (multiple generations per key on disk), rebucket to
    * a different count, read live state back through the generation-aware
    * fast path (post-rebucket every bucket is one file, so the read skips
    * the LWW window — the rewrite must have folded generations or this
    * returns duplicate keys / resurrected deletes). The oracle is the same
    * LWW fold as `cdc_replay_state`: rebucket must be state-invariant. */
  private def cdcRebucket(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("gate-cdc-rebucket")
    val p = new CdcPipeline(LakeTable(root)(spark), "gate",
      lineage = false, mergeOnRead = true)
    p.bootstrap(numBuckets = 16)
    p.replay(derivedEvents(spark, dir), numBatches = 4)
    p.table.rebucket(48, graft.model.CdcModel.KeyCols)
    p.state()
      .select(col("repo"), col("path"), col("commit"), col("lang"),
        sha2(col("content"), 256).as("content_sha"))
      .orderBy("repo", "path", "commit")
  }

  private def cdcSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val ev = derivedEvents(spark, dir)
    val b = ev.agg(min("lsn"), max("lsn")).collect()(0)
    val split = (b.getLong(0) + b.getLong(1)) / 2
    val root = scratch("gate-cdc-evo")
    val p = new CdcPipeline(LakeTable(root)(spark), "gate", lineage = false)
    p.bootstrap(numBuckets = 16)
    p.applyBatch(ev.filter(col("lsn") < split), 0L, orderedDelivery = true)
    p.applyBatch(
      ev.filter(col("lsn") >= split)
        .withColumn("quality",
          when(col("op") =!= "D", (col("lsn") % 100) / lit(100.0))),
      1L, orderedDelivery = true)
    p.state()
      .select(col("repo"), col("path"), col("commit"), col("lang"),
        sha2(col("content"), 256).as("content_sha"), col("quality"))
      .orderBy("repo", "path", "commit")
  }

  /** Time travel: apply two batches, then read live state AS OF the version
    * the first batch committed (LakeTable.readAt / liveState(table, v)). The
    * oracle recomputes LWW over only the first batch's LSN range. */
  private def cdcTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val ev = derivedEvents(spark, dir)
    val b = ev.agg(min("lsn"), max("lsn")).collect()(0)
    val split = (b.getLong(0) + b.getLong(1)) / 2
    val root = scratch("gate-cdc-tt")
    val p = new CdcPipeline(LakeTable(root)(spark), "gate", lineage = false)
    p.bootstrap(numBuckets = 16)
    p.applyBatch(ev.filter(col("lsn") < split), 0L, orderedDelivery = true)
    val v1 = p.table.latestVersion // the snapshot batch 0 committed
    p.applyBatch(ev.filter(col("lsn") >= split), 1L, orderedDelivery = true)
    CdcPipeline.liveState(p.table, v1)
      .select(col("repo"), col("path"), col("commit"), col("lang"),
        sha2(col("content"), 256).as("content_sha"))
      .orderBy("repo", "path", "commit")
  }

  /** Incremental read (Iceberg append scan): files added between the first
    * and second merge-on-read commits are EXACTLY batch 2's LWW winners,
    * tombstones included — the downstream-consumer "what changed since v"
    * feed. The oracle replays LWW over only the second batch's LSN range. */
  private def cdcIncrementalRead(spark: SparkSession, dir: String): DataFrame = {
    val ev = derivedEvents(spark, dir)
    val b = ev.agg(min("lsn"), max("lsn")).collect()(0)
    val split = (b.getLong(0) + b.getLong(1)) / 2
    val root = scratch("gate-cdc-incr")
    val p = new CdcPipeline(LakeTable(root)(spark), "gate", lineage = false,
      mergeOnRead = true)
    p.bootstrap(numBuckets = 16)
    p.applyBatch(ev.filter(col("lsn") < split), 0L, orderedDelivery = true)
    val v1 = p.table.latestVersion
    p.applyBatch(ev.filter(col("lsn") >= split), 1L, orderedDelivery = true)
    val v2 = p.table.latestVersion
    p.table.readAppends(v1, v2)
      .select(col("repo"), col("path"), col("commit"), col("lang"),
        sha2(col("content"), 256).as("content_sha"),
        col("_deleted").as("is_delete"))
      .orderBy("repo", "path", "commit")
  }

  /** Downstream feed: replay half the stream into a merge-on-read source,
    * pipe a KEY-FILTERED projection to a second table via [[CdcFeed]]
    * (durable offsets), land the rest, pipe again — the second pipe must
    * RESUME from the recorded offset. The replica's live state is the
    * source's final LWW state under the same key filter; the oracle computes
    * that directly. */
  private def cdcFeedReplica(spark: SparkSession, dir: String): DataFrame = {
    val ev = derivedEvents(spark, dir)
    val b = ev.agg(min("lsn"), max("lsn")).collect()(0)
    val split = (b.getLong(0) + b.getLong(1)) / 2
    val src = new CdcPipeline(
      LakeTable(scratch("gate-feed-src"))(spark), "gate", lineage = false,
      mergeOnRead = true)
    src.bootstrap(numBuckets = 16)
    val tgt = LakeTable(scratch("gate-feed-tgt"))(spark)
    val off = scratch("gate-feed-off")
    val keyFilter = (d: DataFrame) => d.filter(substring(col("commit"), 1, 1) < "8")
    src.applyBatch(ev.filter(col("lsn") < split), 0L, orderedDelivery = true)
    CdcFeed.pipe(src.table, tgt, "gate-feed", off, transform = keyFilter)
    src.applyBatch(ev.filter(col("lsn") >= split), 1L, orderedDelivery = true)
    val s = CdcFeed.pipe(src.table, tgt, "gate-feed", off, transform = keyFilter)
    require(s.fromVersion >= 0, "second pipe must resume from the durable offset")
    CdcPipeline.liveState(tgt)
      .select(col("repo"), col("path"), col("commit"), col("lang"),
        sha2(col("content"), 256).as("content_sha"))
      .orderBy("repo", "path", "commit")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Point lookups through the bucket-pruned read path: replay a fragmented
    * merge-on-read table, then fetch 12 deterministic keys one at a time via
    * [[CdcPipeline.lookup]] — each lookup reads ONE bucket's files
    * (O(table/numBuckets) IO, the 100 TB point-read path). doc_ids 1..12
    * cover never-updated, updated (%2/%3 incl. the %6 LSN-collision
    * tie-break) and deleted (%5 → the lookup must return NOTHING) keys.
    * The oracle recomputes final LWW state filtered to the same keys. */
  private def cdcPointLookup(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("gate-cdc-lookup")
    val p = new CdcPipeline(LakeTable(root)(spark), "gate", lineage = false,
      mergeOnRead = true)
    p.bootstrap(numBuckets = 16)
    p.replay(derivedEvents(spark, dir), numBatches = 4)
    val snap = p.table.currentSnapshot.get // pin once: 12 lookups, 1 metadata read
    (1L to 12L).map { id =>
      CdcPipeline.lookupAt(p.table, snap, Map(
        "repo" -> s"repo-${id % 50}",
        "path" -> s"src/f$id.txt",
        "commit" -> md5Hex(s"c$id")))._2
    }.reduce(_ unionByName _)
      .select(col("repo"), col("path"), col("commit"), col("lang"),
        sha2(col("content"), 256).as("content_sha"))
      .orderBy("repo", "path", "commit")
  }

  private def cdcLineage(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("gate-cdc-lin")
    val p = new CdcPipeline(LakeTable(root)(spark), "gate")
    p.bootstrap(numBuckets = 16)
    p.replay(derivedEvents(spark, dir), numBatches = 4)
    Lineage.read(spark, root)
      .filter(col("eventsIn") > 0)
      .select(col("batchId"), col("eventsIn"), col("distinctKeys"),
        col("lwwConflicts"), col("minLsn"), col("maxLsn"),
        // byte accounting (reference BytesCounter): exact parquet sizes are
        // engine-internal, so the portable assertion is non-degeneracy
        (col("bytesWritten") > 0).as("bytes_positive"))
      .orderBy("batchId")
  }

  // ---------------------------------------------- relational / ELT parity ----

  private def dec(c: Column): Column = c.cast("decimal(18,4)")

  private def q1Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
        // the revenue sum is a scale-8 decimal; cast it to scale 4 FIRST so
        // the decimal→double conversion is exact in both engines (a scale-4
        // integer representation stays < 2^53 at gate scales, so the double
        // is correctly rounded everywhere) — DuckDB's direct int128-decimal→
        // double cast double-rounds (…0.0123005 vs the correct …0.0123 at
        // sf0.1), which was the one 10×-scale gate divergence
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount"))))
          .cast("decimal(38,4)").cast("double").as("revenue"))
      .orderBy("l_returnflag", "l_linestatus")

  private def s1ScanFilter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
      .orderBy("l_orderkey", "l_linenumber")

  private def p5PreviewLimit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").orderBy("o_orderkey").limit(3)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("o_totalprice"))

  /** J1: the reference's upsert as anti-join + union-all (dialect.go:26-29):
    * staging = every 10th order with re-priced total; primary rows whose key
    * matches staging are replaced. */
  private def j1Upsert(spark: SparkSession, dir: String): DataFrame = {
    val primary = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        dec(col("o_totalprice")).as("tp"))
    val staging = primary.filter(col("o_orderkey") % 10 === 0)
      .withColumn("tp", col("tp") + lit(1).cast("decimal(18,4)"))
      .withColumn("o_orderstatus", lit("R"))
    primary.join(staging.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      .unionByName(staging)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("tp").cast("double").as("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** J3/A1: multi-join + aggregation (the in-warehouse CTAS transform class,
    * transform.go:10-40) — revenue per nation, small dims broadcast.
    *
    * Round 6: examined and deliberately left as-is. The executed plan
    * (plans/r06/j2_join_agg_before.txt) already BroadcastHashJoins all three
    * right sides — lineitem, the only big side, never shuffles; the sole
    * hash Exchange is the 25-row per-nation aggregate (map-side combined).
    * A per-orderkey pre-aggregation (guide §2.3) was prototyped and rejected:
    * it ADDS an orderkey Exchange that the broadcast plan does not have, and
    * at a scale where orders stops fitting a broadcast, AQE's SMJ still
    * benefits more from the planner's own partial aggregation.
    */
  private def j2JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        // scale-4 first: exact decimal→double in both engines (see q1Agg)
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount"))))
          .cast("decimal(38,4)").cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** Window / top-k per group: most expensive order per customer. */
  private def w1TopPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice").cast("double").as("o_totalprice"))
      .orderBy("o_custkey")
  }

  /** Set ops (U3/U4): customers that placed an order but none with status F. */
  private def u1SetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val withOrders = o.select(col("o_custkey").as("custkey")).distinct()
    val withF = o.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey")).distinct()
    withOrders.exceptAll(withF).orderBy("custkey")
  }

  /** O1: deterministic alphabetical column order (api.go:642-652). */
  private def o1SortedCols(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .withColumn("ts_s", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .drop("ts")
    e.select(e.columns.sorted.map(col): _*).orderBy("event_id")
  }

  /** P4/T3: ModifiedOnly lookback — rows within 36h of the newest event
    * (database.go:179-187, with the cutoff derived from data, not now()). */
  private def p4Lookback(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val cutoff = e.agg((max(col("ts")) - expr("INTERVAL 36 HOURS")).as("c"))
    e.join(broadcast(cutoff)).filter(col("ts") > col("c"))
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy("event_id")
  }

  /** F1/F2/F6: per-column scalar transform chain + computed column
    * (value*100 as int — transform_column_and_change_type.port; strftime
    * computed column — compute_column.port). */
  private def f2Transforms(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(
        col("event_id"),
        floor(col("value") * 100).cast("long").as("value_cents"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        upper(col("event_type")).as("event_type_uc"))
      .orderBy("event_id")

  /** F3/F4: JSON deserialize column (deserialize_json_column.port → dig). */
  private def f4JsonExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")

  // ------------------------------------------------- training-data ops ----

  private def dedupExact(spark: SparkSession, dir: String): DataFrame =
    DedupOps.exact(t(spark, dir, "documents"))
      .select(col("fp"), col("keep_id"), col("dup_count"))
      .orderBy("fp")

  private def textStats(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    d.select(
      col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      length(col("text")).cast("long").as("n_chars_m"),
      TextFunctions.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")
  }

  private def textLangId(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), TextFunctions.langId(col("text")).as("pred_lang"))
      .orderBy("doc_id")

  /** Gate runs the CAPPED path (dfCap=100) — the plan every production call
    * gets by default; the oracle applies the identical hot-shingle filter. */
  private def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    DedupOps.ngramJaccardPairs(
      t(spark, dir, "documents").filter(col("doc_id") < 500), n = 3, threshold = 0.2,
      dfCap = 100)
      .select(col("a"), col("b")) // jaccard value checked via threshold only
      .orderBy("a", "b")

  /** Benchmark decontamination: docs 0-399 are the "training corpus", docs
    * 400-499 the "benchmark"; any 3-gram overlap flags the training doc.
    * The complementary clean corpus is `decontaminate` (anti-join of these
    * ids) — spec-asserted; the gate checks the flagged set value-exact. */
  private def decontaminateQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    DedupOps.contaminated(
      docs.filter(col("doc_id") < 400),
      docs.filter(col("doc_id") >= 400 && col("doc_id") < 500), n = 3)
      .orderBy("doc_id")
  }

  private def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    DedupOps.minhashLshPairs(
      t(spark, dir, "documents").filter(col("doc_id") < 500),
      n = 3, bands = 4, rowsPerBand = 2)
      .orderBy("a", "b")

  /** Pairs → duplicate clusters: connected components over the MinHash-LSH
    * candidate pairs, cluster_id = component min doc id (the canonical
    * survivor, [[DedupOps.clusters]]). Oracle = recursive-CTE transitive
    * closure over the identical pair set. */
  private def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    DedupOps.clusters(
      DedupOps.minhashLshPairs(
        t(spark, dir, "documents").filter(col("doc_id") < 500),
        n = 3, bands = 4, rowsPerBand = 2))
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy("doc_id")

  /** Corpus in → deduped corpus out: drop non-canonical members of the
    * MinHash-LSH duplicate clusters, keep singletons ([[DedupOps.canonical]]).
    */
  private def dedupCanonical(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").filter(col("doc_id") < 500)
    DedupOps.canonical(docs,
        DedupOps.minhashLshPairs(docs, n = 3, bands = 4, rowsPerBand = 2))
      .select(col("doc_id"), sha2(col("text"), 256).as("text_sha"))
      .orderBy("doc_id")
  }

  /** Portable md5-bit simhash at maxDist=3 — band blocking (maxDist+1
    * bands) is lossless, so the all-pairs DuckDB oracle is an exact match.
    * The xxhash64 fast-path variant is covered by OperatorsSpec. */
  private def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    DedupOps.simhashPairsPortable(
      t(spark, dir, "documents").filter(col("doc_id") < 500), maxDist = 3)
      .orderBy("a", "b")

  private def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    SimilarityOps.bruteForceTopK(emb.filter(col("vec_id") < 5), emb, k = 3)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos_r"))
      .orderBy("query_id", "neighbor_id")
  }

  private def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    SimilarityOps.lshTopK(emb.filter(col("vec_id") < 5), emb, k = 3, planes = 4)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos_r"))
      .orderBy("query_id", "neighbor_id")
  }

  private def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    // trainSampleMod=2: the quantizer trains on the deterministic half-sample
    // (the scale path — each Lloyd iteration scans corpus/2), the full corpus
    // is assigned once; the oracle replays the identical sampled iterations
    SimilarityOps.ivfTopK(emb.filter(col("vec_id") < 5), emb, k = 3,
        nlist = 16, nprobe = 4, trainSampleMod = 2)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos_r"))
      .orderBy("query_id", "neighbor_id")
  }

  private def dedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.cosineNearDupPairs(
      t(spark, dir, "embeddings"), threshold = 0.22, planes = 4)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos_r"))
      .orderBy("a", "b")

  /** Multimodal plumbing: text → binary column + typed metadata (byte length,
    * utf8 validity, content hash over the string form — DuckDB's sha256 is
    * VARCHAR-only so the hash is computed pre-encode in both engines). */
  private def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"),
        sha2(col("text"), 256).as("content_sha"))
      .select(col("doc_id"), octet_length(col("blob")).cast("long").as("n_bytes"),
        col("content_sha"))
      .orderBy("doc_id")

  /** F8: CSV serialization rules (util.go:68-91) — booleans as words,
    * timestamps RFC3339 UTC, dates yyyy-MM-dd. (%E float form is covered by
    * SourcesSpec; Java vs C printf exponent widths differ, so the gate
    * checks the date/time/bool rules.) */
  private def f8CsvFormat(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ssX").as("ts_rfc3339"),
        when(col("value") >= 100, "true").otherwise("false").as("big_flag"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .orderBy("event_id")

  /** A1: the SQL Transform entry point (`teleport transform`,
    * transform.go:10-40) through the REAL engine: spark.sql CTAS into a
    * LakeTable with atomic snapshot swap, read back. */
  private def a1CtasTransform(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "events").createOrReplaceTempView("gate_events")
    val dest = LakeTable(scratch("gate-ctas"))(spark)
    graft.operators.SqlTransform(spark,
      "SELECT cast(ts as date) AS day, count(*) AS n, " +
        "cast(sum(cast(value as decimal(18,4))) as double) AS total " +
        "FROM gate_events GROUP BY 1", dest, keyCols = Seq("day"), appId = "gate")
    dest.read().select(date_format(col("day"), "yyyy-MM-dd").as("day"),
      col("n"), col("total")).orderBy("day")
  }

  /** F1/F2 via the config surface: ColumnTransforms (the Starlark
    * TransformColumn/ComputeColumn parity module) applied end-to-end. */
  private def a2TransformChain(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.ColumnTransforms
    ColumnTransforms(t(spark, dir, "events"),
      transforms = Seq(
        ColumnTransforms.ColumnSpec("value", Seq("multiply:100"), castTo = None),
        ColumnTransforms.ColumnSpec("event_type", Seq("upper"))),
      computed = Seq(
        ColumnTransforms.ComputedSpec("day", "date_format(ts, 'yyyy-MM-dd')"),
        ColumnTransforms.ComputedSpec("k", "cast(get_json_object(props, '$.k') as bigint)")))
      .select(col("event_id"), floor(col("value")).cast("long").as("value_cents"),
        col("event_type").as("event_type_uc"), col("day"), col("k"))
      .orderBy("event_id")
  }

  /** Multimodal frame-sampling plumbing (1→n fan-out over binary payloads):
    * byte-exact frame sizes are portable; frame hashes are engine-internal. */
  private def mmFrames(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.MultimodalOps
    val media = MultimodalOps.asMedia(
      t(spark, dir, "documents").select(col("doc_id").as("media_id"),
        lit("video").as("kind"), encode(col("text"), "UTF-8").as("bytes")))
    MultimodalOps.sampleFrames(media, n = 4)
      .select(col("media_id"), col("frame_idx"), col("frame_n_bytes"))
      .orderBy("media_id", "frame_idx")
  }

  /** Config-file frontend end-to-end (the reference's .port surface,
    * database_configuration.go:100-263): a JSON job spec on disk drives
    * extract → column projection → transform chain → computed column → Full
    * load into a LakeTable; the gate reads the destination back. */
  private def cfgExtractLoad(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("gate-cfg")
    val spec = s"""{
      "source": {"format": "parquet", "path": "$dir/events.parquet"},
      "destination": {"root": "$root/dest", "numBuckets": 8},
      "tables": {
        "events": {
          "loadStrategy": "Full",
          "primaryKey": ["event_id"],
          "columns": ["event_id", "event_type", "value", "ts"],
          "transforms": [
            {"column": "value", "ops": ["multiply:100"], "castTo": "integer"},
            {"column": "event_type", "ops": ["upper"]}],
          "computed": [{"column": "day", "sqlExpr": "date_format(ts, 'yyyy-MM-dd')"}]
        }
      }
    }"""
    Files.writeString(java.nio.file.Paths.get(s"$root/events.job.json"), spec)
    graft.config.JobRunner.run(spark,
      graft.config.JobSpec.load(spark, s"$root/events.job.json"), "events")
    LakeTable(s"$root/dest")(spark).read()
      .select(col("event_id"), col("value").as("value_cents"),
        col("event_type").as("event_type_uc"), col("day"))
      .orderBy("event_id")
  }

  /** End-to-end `.port` migration gate: a Starlark-shaped config in the
    * reference's own declarative style (Table/LoadStrategy/TransformColumn
    * with helper lambdas — the transform_column.port shapes) parses through
    * [[graft.config.PortSpec]], runs through JobRunner, and the loaded table
    * matches the DuckDB oracle — the migration path is value-gated, not just
    * spec-tested. The .port text is our own (same shapes as the fixtures,
    * not copied); the widgets input derives deterministically from events. */
  private def cfgPortLoad(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("gate-port")
    spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id").as("id"),
        (col("event_id") % 100).cast("double").as("ranking"),
        col("event_type").as("name"))
      .write.mode("overwrite").parquet(s"$root/widgets.parquet")
    val portText =
      """def toPercent(value):
        |  return value * 100
        |
        |def shout(value):
        |  return value.upper()
        |
        |Table("widgets") \
        |  .LoadStrategy(Full) \
        |  .TransformColumn("ranking", toPercent) \
        |  .TransformColumn("name", shout)
        |""".stripMargin
    val spec = graft.config.PortSpec.toJobSpec(portText,
      destination = graft.config.DestinationSpec(s"$root/dest", 8),
      dbSource = Some(graft.config.SourceSpec("parquet", path = s"$root/widgets.parquet")))
    graft.config.JobRunner.run(spark, spec, "widgets")
    graft.cdc.CdcPipeline.liveState(LakeTable(s"$root/dest")(spark))
      .select(col("id"), col("ranking"), col("name"))
      .orderBy("id")
  }

  /** ModifiedOnly upsert through the config frontend (modified_only.port:
    * lookback filter by modified-at column + delete-match upsert by primary
    * key): a Full run tags every row 'full', then a ModifiedOnly run
    * re-extracts only the 36h-lookback window tagged 'recent' and upserts —
    * final state shows which rows the second run touched. */
  private def cfgModifiedOnly(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("gate-cfg-mo")
    def spec(strategy: String, tag: String, goBack: Int): String = s"""{
      "source": {"format": "parquet", "path": "$dir/events.parquet"},
      "destination": {"root": "$root/dest", "numBuckets": 8},
      "tables": {
        "events": {
          "loadStrategy": "$strategy",
          "primaryKey": ["event_id"],
          "modifiedAtColumn": "ts",
          "goBackHours": $goBack,
          "columns": ["event_id", "ts"],
          "computed": [{"column": "tag", "sqlExpr": "'$tag'"}]
        }
      }
    }"""
    Files.writeString(java.nio.file.Paths.get(s"$root/full.json"), spec("Full", "full", 0))
    Files.writeString(java.nio.file.Paths.get(s"$root/mo.json"), spec("ModifiedOnly", "recent", 36))
    graft.config.JobRunner.run(spark,
      graft.config.JobSpec.load(spark, s"$root/full.json"), "events")
    graft.config.JobRunner.run(spark,
      graft.config.JobSpec.load(spark, s"$root/mo.json"), "events")
    LakeTable(s"$root/dest")(spark).read()
      .select(col("event_id"), col("tag"))
      .orderBy("event_id")
  }

  /** Incremental loads through the config frontend go through the engine's
    * bucket-pruned MERGE, not a full-table rewrite: a Full load (128 buckets)
    * tags every row 'full'; a ModifiedOnly load re-extracts only the
    * 2h-lookback window tagged 'recent' and MERGE-upserts it. The `pruned`
    * column asserts the physical claim — the second load rewrote strictly
    * fewer files than the table holds (O(touched buckets), the property that
    * keeps a 100 TB destination from being rewritten per load) — while the
    * row values assert the reference's delete-match upsert semantics
    * (dialect.go:26-29). */
  private def cfgIncrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("gate-cfg-inc")
    def spec(strategy: String, tag: String, goBack: Int): String = s"""{
      "source": {"format": "parquet", "path": "$dir/events.parquet"},
      "destination": {"root": "$root/dest", "numBuckets": 128},
      "tables": {
        "events": {
          "loadStrategy": "$strategy",
          "primaryKey": ["event_id"],
          "modifiedAtColumn": "ts",
          "goBackHours": $goBack,
          "columns": ["event_id", "ts"],
          "computed": [{"column": "tag", "sqlExpr": "'$tag'"}]
        }
      }
    }"""
    Files.writeString(java.nio.file.Paths.get(s"$root/full.json"), spec("Full", "full", 0))
    Files.writeString(java.nio.file.Paths.get(s"$root/inc.json"), spec("ModifiedOnly", "recent", 2))
    graft.config.JobRunner.run(spark,
      graft.config.JobSpec.load(spark, s"$root/full.json"), "events")
    val dest = LakeTable(s"$root/dest")(spark)
    val filesBefore = dest.currentSnapshot.get.files.size
    val r = graft.config.JobRunner.run(spark,
      graft.config.JobSpec.load(spark, s"$root/inc.json"), "events")
    val stats = r.mergeStats.getOrElse(sys.error("incremental load did not MERGE"))
    val pruned = stats.filesRewritten > 0 && stats.filesRewritten < filesBefore
    dest.read()
      .select(col("event_id"), col("tag"), lit(pruned).as("pruned"))
      .orderBy("event_id")
  }

  /** Endpoint-driven extract-load end-to-end (≙ `teleport extract-load-api`,
    * api.go:47-76) through the REAL pipeline: a `format: "api"` job spec +
    * an in-process fake endpoint (≙ the reference's httptest corpus,
    * api_test.go:204-250) serving the events table as `{offset}`-paginated
    * JSON pages; pages stream through transform + MERGE in bounded
    * micro-batches; the gate reads the destination back. */
  /** CSV endpoint body end-to-end (≙ the api_csv.port fixture): the fake
    * serves ONE CSV page (csv responses never paginate in the reference
    * corpus) with planted EMPTY cells — the gate proves header-row parse,
    * RFC-4180 handling, the EMPTYASNULL typed cast and the MERGE load in one
    * value-exact query. Doubles round-trip exactly: Scala's Double.toString
    * is the shortest representation, and the typed cast parses it back to
    * the identical bits the oracle reads from parquet. */
  private def cfgApiCsv(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("gate-cfg-api-csv")
    val rows = t(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id").collect()
    val body = "event_id,event_type,value\n" + rows.map { r =>
      val v = if (r.getLong(0) % 97 == 0) "" else r.getDouble(2).toString
      s"${r.getLong(0)},${r.getString(1)},$v"
    }.mkString("\n") + "\n"
    val fake: graft.sources.HttpRequest => graft.sources.HttpResponse =
      _ => graft.sources.HttpResponse(200, body)
    val spec = graft.config.JobSpec.parse(s"""{
      "source": {"format": "api", "url": "http://fake/events.csv",
        "responseType": "csv",
        "schema": "event_id:integer,event_type:string,value:double"},
      "destination": {"root": "$root/dest", "numBuckets": 16},
      "tables": {
        "events": {
          "loadStrategy": "Full",
          "primaryKey": ["event_id"]
        }
      }
    }""")
    graft.config.JobRunner.run(spark, spec, "events", transport = fake)
    LakeTable(s"$root/dest")(spark).read()
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  private def cfgApiLoad(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("gate-cfg-api")
    val rows = t(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id").collect()
    val pageSize = 500
    val fake: graft.sources.HttpRequest => graft.sources.HttpResponse = req => {
      val off = "offset=(\\d+)".r.findFirstMatchIn(req.url).map(_.group(1).toInt).getOrElse(0)
      val page = rows.slice(off, off + pageSize)
      val items = page.map(r =>
        s"""{"event_id":${r.getLong(0)},"event_type":"${r.getString(1)}","value":${r.getDouble(2)}}""")
        .mkString(",")
      val next = if (off + pageSize < rows.length) s""","offset":${off + pageSize}""" else ""
      graft.sources.HttpResponse(200, s"""{"items":[$items]$next}""")
    }
    val spec = graft.config.JobSpec.parse(s"""{
      "source": {"format": "api", "url": "http://fake/events?offset={offset}",
        "schema": "event_id:integer,event_type:string,value:float",
        "pagesPerBatch": 5},
      "destination": {"root": "$root/dest", "numBuckets": 16},
      "tables": {
        "events": {
          "loadStrategy": "Full",
          "primaryKey": ["event_id"],
          "transforms": [{"column": "event_type", "ops": ["upper"]}]
        }
      }
    }""")
    graft.config.JobRunner.run(spark, spec, "events", transport = fake)
    LakeTable(s"$root/dest")(spark).read()
      .select(col("event_id"), col("event_type").as("event_type_uc"), col("value"))
      .orderBy("event_id")
  }

  /** F5 yaml.loads (starlarkextensions.go:21-28) through the ColumnTransforms
    * op vocabulary, on Ruby-serialized YAML like
    * deserialize_ruby_yaml_column.port: strip the `ivars:` tail (the
    * fixture's own Starlark surgery), parse YAML → JSON, dig out fields. */
  private def f5Yaml(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.ColumnTransforms
    val docs = t(spark, dir, "events").select(col("event_id"),
      concat(
        lit("--- !ruby/hash-with-ivars:ActionController::Parameters\nelements:\n  append: '"),
        upper(col("event_type")),
        lit("'\n  k: "), floor(col("value") * 100).cast("long"),
        lit("\nivars:\n  :@permitted: false\n")).as("y"))
    ColumnTransforms(docs,
      transforms = Seq(ColumnTransforms.ColumnSpec("y",
        Seq("strip_after:\nivars:", "yaml"))),
      computed = Seq(
        ColumnTransforms.ComputedSpec("append", "get_json_object(y, '$.elements.append')"),
        ColumnTransforms.ComputedSpec("k",
          "cast(get_json_object(y, '$.elements.k') as bigint)")))
      .select(col("event_id"), col("append"), col("k"))
      .orderBy("event_id")
  }

  /** PII redaction over deterministically PII-laden text (the documents
    * table carries no natural PII, so the gate plants emails, phones and
    * IPs derived from doc_id — the oracle constructs the identical string
    * and replays the identical regex chain). */
  private def textRedactPii(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.redactPii(concat(
          lit("contact u"), col("doc_id").cast("string"), lit("@example.com re: "),
          col("text"),
          lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" or +4479460"), lpad((col("doc_id") % 100000).cast("string"), 5, "0"),
          lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7 EOF")))
          .as("redacted"))
      .orderBy("doc_id")

  /** Within-document line dedup on planted duplicated lines (license header
    * + body repeated) — first occurrence kept, order preserved. */
  private def dedupLinesQ(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.dedupLines(concat_ws("\n",
          lit("// SPDX-License-Identifier: MIT"), col("text"),
          lit("// SPDX-License-Identifier: MIT"), col("text"),
          lit("EOF"))).as("deduped"))
      .orderBy("doc_id")

  /** Quality scoring over documents (length/stopword/punct/upper mix). */
  private def textQuality(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.qualityScore(col("text"),
          TextFunctions.langMarkers("en")).as("quality"))
      .orderBy("doc_id")

  /** Gopher-style duplicate-2-gram fraction per document. */
  private def textRepetition(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        TextFunctions.repetitionRatio(col("text"), n = 2).as("rep2"))
      .orderBy("doc_id")

  // ------------------------------------------------------------ registry ----

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_replay_state" -> (cdcReplayState _),
    "cdc_rebucket" -> (cdcRebucket _),
    "cdc_dedup_lww" -> ((s, d) => {
      val deduped = graft.cdc.Dedup.lastWriterWins(derivedEvents(s, d))
      deduped.select(col("repo"), col("path"), col("commit"), col("lsn"),
          col("op"), sha2(col("content"), 256).as("content_sha"))
        .orderBy("repo", "path", "commit")
    }),
    "cdc_events_derive" -> ((s, d) =>
      derivedEvents(s, d)
        .select(col("lsn"), col("op"), col("repo"), col("path"), col("commit"),
          col("lang"), sha2(col("content"), 256).as("content_sha"))
        .orderBy("lsn", "repo", "path", "op", "content_sha")),
    "cdc_schema_evolution" -> (cdcSchemaEvolution _),
    "cdc_time_travel" -> (cdcTimeTravel _),
    "cdc_incremental_read" -> (cdcIncrementalRead _),
    "cdc_feed_replica" -> (cdcFeedReplica _),
    "cdc_point_lookup" -> (cdcPointLookup _),
    "cdc_lineage" -> (cdcLineage _),
    "q1_agg" -> (q1Agg _),
    "s1_scan_filter" -> (s1ScanFilter _),
    "p5_preview_limit" -> (p5PreviewLimit _),
    "j1_upsert" -> (j1Upsert _),
    "j2_join_agg" -> (j2JoinAgg _),
    "w1_top_per_group" -> (w1TopPerGroup _),
    "u1_set_ops" -> (u1SetOps _),
    "o1_sorted_cols" -> (o1SortedCols _),
    "p4_lookback" -> (p4Lookback _),
    "f2_transforms" -> (f2Transforms _),
    "f4_json_extract" -> (f4JsonExtract _),
    "dedup_exact" -> (dedupExact _),
    "text_stats" -> (textStats _),
    "text_langid" -> (textLangId _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_minhash_lsh" -> (minhashLsh _),
    "dedup_decontaminate" -> (decontaminateQ _),
    "dedup_simhash" -> (simhashPairs _),
    "dedup_clusters" -> (dedupClusters _),
    "dedup_canonical" -> (dedupCanonical _),
    "ann_topk_cosine" -> (annTopK _),
    "ann_lsh_cosine" -> (annLsh _),
    "ann_ivf_cosine" -> (annIvf _),
    "dedup_embedding_cosine" -> (dedupEmbedding _),
    "multimodal_meta" -> (multimodalMeta _),
    "f8_csv_format" -> (f8CsvFormat _),
    "a1_ctas_transform" -> (a1CtasTransform _),
    "a2_transform_chain" -> (a2TransformChain _),
    "mm_frames" -> (mmFrames _),
    "text_quality" -> (textQuality _),
    "text_repetition" -> (textRepetition _),
    "text_redact_pii" -> (textRedactPii _),
    "dedup_lines" -> (dedupLinesQ _),
    "cfg_extract_load" -> (cfgExtractLoad _),
    "cfg_modified_only" -> (cfgModifiedOnly _),
    "cfg_incremental_merge" -> (cfgIncrementalMerge _),
    "cfg_api_load" -> (cfgApiLoad _),
    "cfg_api_csv" -> (cfgApiCsv _),
    "cfg_port_load" -> (cfgPortLoad _),
    "f5_yaml" -> (f5Yaml _))

  // ------------------------------------------------------------- oracles ----

  /** Shared DuckDB CTE reproducing [[DerivedEvents.fromDocuments]]. */
  private val evCte: String = """
    WITH ev AS (
      SELECT
        CASE WHEN k = 0 THEN doc_id*8 WHEN k = 3 THEN doc_id*8+5 ELSE doc_id*8+2 END AS lsn,
        CASE WHEN k = 0 THEN 'I' WHEN k = 3 THEN 'D' ELSE 'U' END AS op,
        'repo-' || CAST(doc_id % 50 AS VARCHAR) AS repo,
        'src/f' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
        md5('c' || CAST(doc_id AS VARCHAR)) AS "commit",
        lang,
        CASE WHEN k = 0 THEN text WHEN k = 1 THEN text || ' v1'
             WHEN k = 2 THEN text || ' v2' ELSE '' END AS content
      FROM documents, (SELECT unnest(range(4)) AS k)
      WHERE k = 0 OR (k = 1 AND doc_id % 2 = 0)
         OR (k = 2 AND doc_id % 3 = 0) OR (k = 3 AND doc_id % 5 = 0))"""

  private val lwwRanked: String = """
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY repo, path, "commit"
        ORDER BY lsn DESC,
          (CASE WHEN op = 'D' THEN 1 ELSE 0 END) DESC,
          content DESC) AS rn
      FROM ev)"""

  def oracleSql: Map[String, String] = Map(
    "cdc_replay_state" -> s"""$evCte, $lwwRanked
      SELECT repo, path, "commit", lang, sha256(content) AS content_sha
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY repo, path, "commit"""",
    "cdc_rebucket" -> s"""$evCte, $lwwRanked
      SELECT repo, path, "commit", lang, sha256(content) AS content_sha
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY repo, path, "commit"""",
    "cdc_feed_replica" -> s"""$evCte, $lwwRanked
      SELECT repo, path, "commit", lang, sha256(content) AS content_sha
      FROM ranked WHERE rn = 1 AND op <> 'D' AND substr("commit", 1, 1) < '8'
      ORDER BY repo, path, "commit"""",
    "cdc_dedup_lww" -> s"""$evCte, $lwwRanked
      SELECT repo, path, "commit", lsn, op, sha256(content) AS content_sha
      FROM ranked WHERE rn = 1
      ORDER BY repo, path, "commit"""",
    "cdc_events_derive" -> s"""$evCte
      SELECT lsn, op, repo, path, "commit", lang, sha256(content) AS content_sha
      FROM ev ORDER BY lsn, repo, path, op, content_sha""",
    "cdc_schema_evolution" -> s"""$evCte,
      bounds AS (SELECT (min(lsn)+max(lsn))//2 AS split FROM ev),
      ev2 AS (
        SELECT *, CASE WHEN lsn >= (SELECT split FROM bounds) AND op <> 'D'
          THEN (lsn % 100) / 100.0 END AS quality FROM ev),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY repo, path, "commit"
          ORDER BY lsn DESC,
            (CASE WHEN op = 'D' THEN 1 ELSE 0 END) DESC,
            content DESC) AS rn
        FROM ev2)
      SELECT repo, path, "commit", lang, sha256(content) AS content_sha, quality
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY repo, path, "commit"""",
    "cdc_time_travel" -> s"""$evCte,
      bounds AS (SELECT (min(lsn)+max(lsn))//2 AS split FROM ev),
      ev1 AS (SELECT * FROM ev WHERE lsn < (SELECT split FROM bounds)),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY repo, path, "commit"
          ORDER BY lsn DESC,
            (CASE WHEN op = 'D' THEN 1 ELSE 0 END) DESC,
            content DESC) AS rn
        FROM ev1)
      SELECT repo, path, "commit", lang, sha256(content) AS content_sha
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY repo, path, "commit"""",
    "cdc_incremental_read" -> s"""$evCte,
      bounds AS (SELECT (min(lsn)+max(lsn))//2 AS split FROM ev),
      ev2 AS (SELECT * FROM ev WHERE lsn >= (SELECT split FROM bounds)),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY repo, path, "commit"
          ORDER BY lsn DESC,
            (CASE WHEN op = 'D' THEN 1 ELSE 0 END) DESC,
            content DESC) AS rn
        FROM ev2)
      SELECT repo, path, "commit", lang, sha256(content) AS content_sha,
        (op = 'D') AS is_delete
      FROM ranked WHERE rn = 1
      ORDER BY repo, path, "commit"""",
    "cdc_point_lookup" -> s"""$evCte, $lwwRanked
      SELECT repo, path, "commit", lang, sha256(content) AS content_sha
      FROM ranked WHERE rn = 1 AND op <> 'D'
        AND path IN ('src/f1.txt','src/f2.txt','src/f3.txt','src/f4.txt',
                     'src/f5.txt','src/f6.txt','src/f7.txt','src/f8.txt',
                     'src/f9.txt','src/f10.txt','src/f11.txt','src/f12.txt')
      ORDER BY repo, path, "commit"""",
    "cdc_lineage" -> s"""$evCte,
      bounds AS (SELECT min(lsn) AS lo, max(lsn) AS hi,
        greatest(1, (max(lsn) - min(lsn) + 4) // 4) AS w FROM ev),
      batched AS (
        SELECT least((lsn - lo) // w, 3) AS batchId, lsn, repo, path, "commit"
        FROM ev, bounds
        WHERE lsn >= lo AND lsn < lo + 4 * w)
      SELECT batchId,
        count(*) AS eventsIn,
        count(DISTINCT (repo, path, "commit")) AS distinctKeys,
        count(*) - count(DISTINCT (repo, path, "commit")) AS lwwConflicts,
        min(lsn) AS minLsn, max(lsn) AS maxLsn,
        TRUE AS bytes_positive
      FROM batched GROUP BY batchId HAVING count(*) > 0 ORDER BY batchId""",
    "q1_agg" -> """
      SELECT l_returnflag, l_linestatus, count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
          (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "s1_scan_filter" -> """
      SELECT l_orderkey, l_linenumber, l_quantity,
        strftime(l_shipdate, '%Y-%m-%d') AS ship_day
      FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1998-01-01' AND l_discount >= 0.05
      ORDER BY l_orderkey, l_linenumber""",
    "p5_preview_limit" -> """
      SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice
      FROM orders ORDER BY o_orderkey LIMIT 3""",
    "j1_upsert" -> """
      WITH staging AS (
        SELECT o_orderkey, 'R' AS o_orderstatus,
          CAST(o_totalprice AS DECIMAL(18,4)) + CAST(1 AS DECIMAL(18,4)) AS tp
        FROM orders WHERE o_orderkey % 10 = 0)
      SELECT o_orderkey, o_orderstatus, CAST(tp AS DOUBLE) AS o_totalprice FROM (
        SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DECIMAL(18,4)) AS tp
        FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM staging)
        UNION ALL SELECT * FROM staging)
      ORDER BY o_orderkey""",
    "j2_join_agg" -> """
      SELECT n_name,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
          (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",
    "w1_top_per_group" -> """
      SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice FROM (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders)
      WHERE rn = 1 ORDER BY o_custkey""",
    "u1_set_ops" -> """
      SELECT DISTINCT o_custkey AS custkey FROM orders
      EXCEPT
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY custkey""",
    "o1_sorted_cols" -> """
      SELECT event_id, event_type, props,
        strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, user_id, value
      FROM events ORDER BY event_id""",
    "p4_lookback" -> """
      SELECT event_id, user_id, event_type FROM events
      WHERE ts > (SELECT max(ts) - INTERVAL 36 HOUR FROM events)
      ORDER BY event_id""",
    "f2_transforms" -> """
      SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS value_cents,
        strftime(ts, '%Y-%m-%d') AS day, upper(event_type) AS event_type_uc
      FROM events ORDER BY event_id""",
    "f4_json_extract" -> """
      SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
      FROM events ORDER BY event_id""",
    "dedup_exact" -> """
      SELECT sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        min(doc_id) AS keep_id, count(*) AS dup_count
      FROM documents WHERE text IS NOT NULL GROUP BY 1 ORDER BY fp""",
    "text_stats" -> """
      SELECT doc_id,
        CASE WHEN length(trim(text)) = 0 THEN 0
          ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        length(text) AS n_chars_m,
        sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      FROM documents ORDER BY doc_id""",
    "text_langid" -> langIdOracleSql,
    "dedup_ngram_jaccard" -> """
      WITH tk AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE doc_id < 500),
      sh AS (
        SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) <= 2
          THEN [array_to_string(t, ' ')]
          ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
          END)) AS s
        FROM tk),
      hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 100),
      paired AS (SELECT * FROM sh WHERE s NOT IN (SELECT s FROM hot)),
      sizes AS (SELECT doc_id, count(*) AS n_sh FROM paired GROUP BY doc_id),
      shared AS (
        SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
        FROM paired l JOIN paired r ON l.s = r.s AND l.doc_id < r.doc_id
        GROUP BY 1, 2)
      SELECT a, b FROM shared
      JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
      WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.2
      ORDER BY a, b""",
    "dedup_decontaminate" -> """
      WITH tkc AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE doc_id < 400 AND text IS NOT NULL),
      shc AS (
        SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) <= 2
          THEN [array_to_string(t, ' ')]
          ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
          END)) AS s
        FROM tkc),
      tkb AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE doc_id >= 400 AND doc_id < 500 AND text IS NOT NULL),
      shb AS (
        SELECT DISTINCT unnest(list_distinct(CASE WHEN len(t) <= 2
          THEN [array_to_string(t, ' ')]
          ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
          END)) AS s
        FROM tkb)
      SELECT c.doc_id, count(DISTINCT c.s) AS hits
      FROM shc c JOIN shb b ON c.s = b.s
      GROUP BY c.doc_id ORDER BY c.doc_id""",
    "dedup_minhash_lsh" -> s"""
      WITH $minhashBandedCtes
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM banded l JOIN banded r
        ON l.band = r.band AND l.bv = r.bv AND l.doc_id < r.doc_id
      ORDER BY a, b""",
    // same pair set as dedup_minhash_lsh, then connected components as a
    // recursive-CTE transitive closure: cluster_id = min reachable doc id
    "dedup_clusters" -> s"""
      WITH RECURSIVE $minhashReachCtes
      SELECT x AS doc_id, least(x, min(y)) AS cluster_id
      FROM reach GROUP BY x ORDER BY doc_id""",
    // the clusters chain, terminal anti-join: corpus minus non-canonical
    // duplicate-cluster members (singletons pass through)
    "dedup_canonical" -> s"""
      WITH RECURSIVE $minhashReachCtes,
      losers AS (
        SELECT x AS doc_id FROM reach GROUP BY x HAVING least(x, min(y)) <> x)
      SELECT doc_id, sha256(text) AS text_sha
      FROM documents
      WHERE doc_id < 500 AND doc_id NOT IN (SELECT doc_id FROM losers)
      ORDER BY doc_id""",
    "multimodal_meta" -> """
      SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        sha256(text) AS content_sha
      FROM documents ORDER BY doc_id""",
    "f8_csv_format" -> """
      SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ts_rfc3339,
        CASE WHEN value >= 100 THEN 'true' ELSE 'false' END AS big_flag,
        strftime(ts, '%Y-%m-%d') AS day
      FROM events ORDER BY event_id""",
    "a1_ctas_transform" -> """
      SELECT strftime(cast(ts as date), '%Y-%m-%d') AS day, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM events GROUP BY 1 ORDER BY day""",
    "a2_transform_chain" -> """
      SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS value_cents,
        upper(event_type) AS event_type_uc, strftime(ts, '%Y-%m-%d') AS day,
        CAST(props->>'$.k' AS BIGINT) AS k
      FROM events ORDER BY event_id""",
    "mm_frames" -> """
      SELECT doc_id AS media_id, k AS frame_idx,
        CAST(octet_length(encode(text)) // 4 AS INT) AS frame_n_bytes
      FROM documents, (SELECT unnest(range(4)) AS k)
      ORDER BY media_id, frame_idx""",
    // stopword list interpolated from the SAME langMarkers("en") the Spark
    // query passes to qualityScore — widening the profile map cannot desync
    "text_repetition" -> """
      WITH g AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE text IS NOT NULL),
      grams AS (
        SELECT doc_id, CASE WHEN len(t) <= 1
          THEN [array_to_string(t, ' ')]
          ELSE [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]
          END AS gs
        FROM g)
      SELECT doc_id, 1.0 - len(list_distinct(gs)) * 1.0 / len(gs) AS rep2
      FROM grams ORDER BY doc_id""",
    // this oracle (same generated-from-one-source rule as text_langid)
    "text_quality" -> s"""
      WITH q AS (
        SELECT doc_id,
          text IS NULL AS no_text,
          least(length(text) / 500.0, 1.0) AS len_score,
          CASE WHEN len(regexp_split_to_array(lower(trim(text)), '\\s+')) = 0 THEN 0.0
            ELSE len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
              x -> x IN (${TextFunctions.langMarkers("en").map(m => s"'$m'").mkString(",")}))) * 1.0
              / len(regexp_split_to_array(lower(trim(text)), '\\s+')) END AS sw,
          CASE WHEN length(text) = 0 THEN 0.0
            ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) * 1.0
              / length(text) END AS punct,
          CASE WHEN length(text) = 0 THEN 0.0
            ELSE (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))) * 1.0
              / length(text) END AS up
        FROM documents)
      SELECT doc_id, CASE WHEN no_text THEN NULL ELSE greatest(0.0, least(1.0,
        len_score * 0.4 + sw * 0.3 + (1.0 - punct) * 0.2 + (1.0 - up) * 0.1)) END AS quality
      FROM q ORDER BY doc_id""",
    "text_redact_pii" -> """
      SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
        'contact u' || CAST(doc_id AS VARCHAR) || '@example.com re: ' || text ||
        ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        ' or +4479460' || lpad(CAST(doc_id % 100000 AS VARCHAR), 5, '0') ||
        ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 EOF',
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        '\+\d{9,15}|\(\d{3}\)[-.\s]?\d{3}[-.\s]?\d{4}|\b\d{3}[-.]\d{3}[-.]\d{4}\b|\b\d{10}\b|\b\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS redacted
      FROM documents ORDER BY doc_id""",
    "dedup_lines" -> """
      WITH base AS (
        SELECT doc_id,
          '// SPDX-License-Identifier: MIT' || chr(10) || text || chr(10) ||
          '// SPDX-License-Identifier: MIT' || chr(10) || text || chr(10) || 'EOF' AS s
        FROM documents),
      lines AS (
        SELECT doc_id, unnest(split(s, chr(10))) AS line,
          generate_subscripts(split(s, chr(10)), 1) AS i
        FROM base),
      ranked AS (SELECT doc_id, line, i,
        min(i) OVER (PARTITION BY doc_id, line) AS fi FROM lines)
      SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS deduped
      FROM ranked WHERE trim(line) = '' OR i = fi
      GROUP BY doc_id ORDER BY doc_id""",
    "ann_topk_cosine" -> s"""
      WITH q AS (SELECT vec_id AS query_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id AS neighbor_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        FROM embeddings),
      scored AS (
        SELECT query_id, neighbor_id,
          list_dot_product(qv, cv) /
            (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
        FROM q JOIN c ON query_id <> neighbor_id)
      SELECT query_id, neighbor_id, round(cos, 6) AS cos_r FROM scored
      QUALIFY row_number() OVER (PARTITION BY query_id
        ORDER BY cos DESC, neighbor_id ASC) <= 3
      ORDER BY query_id, neighbor_id""",
    "ann_lsh_cosine" -> s"""
      WITH v AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
        FROM embeddings),
      b AS (SELECT vec_id, dv, ${lshBucketSql("dv", planes = 4)} AS bucket FROM v),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_dot_product(q.dv, c.dv) /
            (sqrt(list_dot_product(q.dv, q.dv)) * sqrt(list_dot_product(c.dv, c.dv))) AS cos
        FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id < 5)
      SELECT query_id, neighbor_id, round(cos, 6) AS cos_r FROM scored
      QUALIFY row_number() OVER (PARTITION BY query_id
        ORDER BY cos DESC, neighbor_id ASC) <= 3
      ORDER BY query_id, neighbor_id""",
    "dedup_simhash" -> simhashOracleSql,
    "ann_ivf_cosine" -> ivfOracleSql(nlist = 16, nprobe = 4, k = 3, iters = 2,
      sampleMod = 2),
    "dedup_embedding_cosine" -> s"""
      WITH v AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
        FROM embeddings),
      b AS (SELECT vec_id, dv, ${lshBucketSql("dv", planes = 4)} AS bucket FROM v),
      pairs AS (
        SELECT l.vec_id AS a, r.vec_id AS b,
          list_dot_product(l.dv, r.dv) /
            (sqrt(list_dot_product(l.dv, l.dv)) * sqrt(list_dot_product(r.dv, r.dv))) AS cos
        FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id)
      SELECT a, b, round(cos, 6) AS cos_r FROM pairs WHERE cos >= 0.22
      ORDER BY a, b""",
    "cfg_extract_load" -> """
      SELECT event_id, CAST(trunc(value * 100) AS BIGINT) AS value_cents,
        upper(event_type) AS event_type_uc, strftime(ts, '%Y-%m-%d') AS day
      FROM events ORDER BY event_id""",
    "cfg_port_load" -> """
      SELECT event_id AS id, CAST(event_id % 100 AS DOUBLE) * 100.0 AS ranking,
        upper(event_type) AS name
      FROM events ORDER BY id""",
    "cfg_modified_only" -> """
      SELECT event_id,
        CASE WHEN ts > (SELECT max(ts) - INTERVAL 36 HOUR FROM events)
          THEN 'recent' ELSE 'full' END AS tag
      FROM events ORDER BY event_id""",
    "cfg_incremental_merge" -> """
      SELECT event_id,
        CASE WHEN ts > (SELECT max(ts) - INTERVAL 2 HOUR FROM events)
          THEN 'recent' ELSE 'full' END AS tag,
        TRUE AS pruned
      FROM events ORDER BY event_id""",
    "cfg_api_load" -> """
      SELECT event_id, upper(event_type) AS event_type_uc, value
      FROM events ORDER BY event_id""",
    "cfg_api_csv" -> """
      SELECT event_id, event_type,
        CASE WHEN event_id % 97 = 0 THEN NULL ELSE value END AS value
      FROM events ORDER BY event_id""",
    "f5_yaml" -> """
      SELECT event_id, upper(event_type) AS append,
        CAST(floor(value * 100) AS BIGINT) AS k
      FROM events ORDER BY event_id""")

  /** DuckDB rendering of [[graft.operators.SimilarityOps.lshBucket]]: the
    * plane components are pure 64-bit integer arithmetic (seed squared mod p
    * — kills the affine LCG lattice — then double-stepped MINSTD over
    * (plane, dim, seed=7)), so both engines compute identical doubles and
    * identical sign bits. */
  private def lshBucketSql(vecCol: String, planes: Int, seed: Long = 7L): String = {
    def proj(m: Int): String = {
      val s = s"((${m * 4099L + seed} + d) % 2147483647)"
      s"""list_dot_product($vecCol, list_transform(range(0, len($vecCol)), d ->
         ((((48271 * ((48271 * (($s * $s) % 2147483647) + 12345) % 2147483647)
           + 12345) % 2147483647) % 2000001) - 1000000) / 1000000.0))"""
    }
    (0 until planes).map(m =>
      s"(CASE WHEN ${proj(m)} > 0 THEN ${1L << m} ELSE 0 END)").mkString("(", " + ", ")")
  }

  /** DuckDB rendering of [[graft.operators.SimilarityOps.ivfTopK]] with
    * quantized-Lloyd k-means centroids: the `iters` assignment/update rounds
    * are replayed as CTE pairs. Reproducibility rests on (a) centroid
    * accumulation being EXACT BIGINT sums of round(x·10⁶)-quantized
    * components — order-free, so GROUP BY order can't matter — and (b) every
    * cosine folding the same doubles in the same sequential order in both
    * engines (DuckDB's list_dot_product ≡ Spark's sequential `aggregate`
    * fold, already verified bit-identical by the other ANN oracles). */
  /** Shared oracle CTE chain for the MinHash-LSH family: shingles →
    * signatures → bands (single source — dedup_minhash_lsh, dedup_clusters
    * and dedup_canonical all interpolate this, so a shingling or band-layout
    * change can never desync the cluster oracles from the pair oracle). */
  private val minhashBandedCtes: String = """tk AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE doc_id < 500),
      sh AS (
        SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) <= 2
          THEN [array_to_string(t, ' ')]
          ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
          END)) AS s
        FROM tk),
      sig AS (
        SELECT doc_id,
          min(md5('0#' || s)) AS m0, min(md5('1#' || s)) AS m1,
          min(md5('2#' || s)) AS m2, min(md5('3#' || s)) AS m3,
          min(md5('4#' || s)) AS m4, min(md5('5#' || s)) AS m5,
          min(md5('6#' || s)) AS m6, min(md5('7#' || s)) AS m7
        FROM sh GROUP BY doc_id),
      banded AS (
        SELECT doc_id, band, bv FROM sig, LATERAL (VALUES
          (0, m0 || '|' || m1), (1, m2 || '|' || m3),
          (2, m4 || '|' || m5), (3, m6 || '|' || m7)) AS v(band, bv))"""

  /** [[minhashBandedCtes]] + candidate pairs + bidirectional edges +
    * recursive transitive closure — the clusters chain. */
  private val minhashReachCtes: String = s"""$minhashBandedCtes,
      pairs AS (
        SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
        FROM banded l JOIN banded r
          ON l.band = r.band AND l.bv = r.bv AND l.doc_id < r.doc_id),
      edges AS (
        SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
      reach(x, y) AS (
        SELECT x, y FROM edges
        UNION
        SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x AND e.y <> r.x)"""

  /** text_langid oracle GENERATED from [[TextFunctions.langMarkers]] — the
    * Spark expression and the DuckDB replay share one marker source, so
    * widening the profile map can never desynchronize them. Tie-break
    * parity: Spark's greatest(struct(hits, code)) picks the largest code on
    * equal hits ⇔ ORDER BY hits DESC, lang_code DESC here. */
  private def langIdOracleSql: String = {
    val rows = TextFunctions.langMarkers.toSeq.sortBy(_._1)
      .map { case (code, ms) =>
        s"('$code', len(list_filter(tk, x -> x IN (${ms.map(m => s"'$m'").mkString(",")}))))"
      }.mkString(",\n          ")
    s"""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
        FROM documents),
      scores AS (
        SELECT doc_id, lang_code, hits FROM toks, LATERAL (VALUES
          $rows
        ) AS v(lang_code, hits)),
      best AS (
        SELECT doc_id, lang_code, hits, row_number() OVER (
          PARTITION BY doc_id ORDER BY hits DESC, lang_code DESC) AS rn
        FROM scores)
      SELECT doc_id, CASE WHEN hits = 0 THEN 'und' ELSE lang_code END AS pred_lang
      FROM best WHERE rn = 1 ORDER BY doc_id"""
  }

  private def ivfOracleSql(nlist: Int, nprobe: Int, k: Int, iters: Int,
      dim: Int = 64, sampleMod: Int = 1): String = {
    def cosq(a: String, b: String): String = {
      def d(x: String) = s"list_transform($x, q -> CAST(q AS DOUBLE))"
      s"list_dot_product(${d(a)}, ${d(b)}) / " +
        s"(sqrt(list_dot_product(${d(a)}, ${d(a)})) * sqrt(list_dot_product(${d(b)}, ${d(b)})))"
    }
    val iterCtes = (1 to iters).map { i =>
      s"""a$i AS (SELECT vec_id, vq, cid FROM (
          SELECT v.vec_id, v.vq, c.cid,
            row_number() OVER (PARTITION BY v.vec_id
              ORDER BY ${cosq("v.vq", "c.csum")} DESC, c.cid ASC) AS rn
          FROM vs v, c${i - 1} c) WHERE rn = 1),
      n$i AS (SELECT cid, list(s ORDER BY d) AS csum FROM (
          SELECT cid, d, sum(vq[d + 1]) AS s
          FROM a$i, (SELECT unnest(range($dim)) AS d)
          GROUP BY cid, d) GROUP BY cid),
      c$i AS (SELECT c.cid, coalesce(n.csum, c.csum) AS csum
          FROM c${i - 1} c LEFT JOIN n$i n ON c.cid = n.cid)"""
    }.mkString(",\n      ")
    s"""
      WITH v AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv,
          list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS vq
        FROM embeddings),
      vs AS (SELECT * FROM v
        WHERE ((48271 * (vec_id % 2147483647) + 12345) % 2147483647) % $sampleMod = 0),
      c0 AS (SELECT vec_id AS cid, vq AS csum FROM vs ORDER BY vec_id LIMIT $nlist),
      $iterCtes,
      lists AS (
        SELECT vec_id AS neighbor_id, dv AS cv, cid AS list_id FROM (
          SELECT v.vec_id, v.dv, c.cid,
            row_number() OVER (PARTITION BY v.vec_id
              ORDER BY ${cosq("v.vq", "c.csum")} DESC, c.cid ASC) AS rn
          FROM v, c$iters c) WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, dv AS qv, cid AS list_id FROM (
          SELECT v.vec_id, v.dv, c.cid,
            row_number() OVER (PARTITION BY v.vec_id
              ORDER BY ${cosq("v.vq", "c.csum")} DESC, c.cid ASC) AS rn
          FROM v, c$iters c WHERE v.vec_id < 5) WHERE rn <= $nprobe),
      scored AS (
        SELECT query_id, neighbor_id,
          list_dot_product(qv, cv) /
            (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
        FROM lists JOIN probes USING (list_id)
        WHERE query_id <> neighbor_id)
      SELECT query_id, neighbor_id, round(cos, 6) AS cos_r FROM scored
      QUALIFY row_number() OVER (PARTITION BY query_id
        ORDER BY cos DESC, neighbor_id ASC) <= $k
      ORDER BY query_id, neighbor_id"""
  }

  /** DuckDB rendering of [[graft.operators.DedupOps.simhashPairsPortable]]:
    * per-token md5 hex → 64 ±1 bit votes → per-doc sums; the Hamming
    * distance between two signatures equals the number of bit positions
    * whose vote-sum signs differ, so the oracle never assembles the 64-bit
    * integer (DuckDB cannot shift into bit 63) and needs no band blocking —
    * pigeonhole banding on the Spark side is lossless at maxDist=3, so the
    * all-pairs oracle is the same set. */
  private def simhashOracleSql: String = {
    val sums = (0 until 64).map { b =>
      val digit = s"(strpos('0123456789abcdef', substr(h, ${b / 4 + 1}, 1)) - 1)"
      s"sum(CASE WHEN (($digit // ${1L << (b % 4)}) % 2) = 1 THEN 1 ELSE -1 END) AS b$b"
    }.mkString(",\n          ")
    val dist = (0 until 64).map(b =>
      s"(CASE WHEN (l.b$b > 0) <> (r.b$b > 0) THEN 1 ELSE 0 END)").mkString(" + ")
    s"""
      WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
        FROM documents WHERE doc_id < 500),
      hs AS (SELECT doc_id, md5(tok) AS h FROM toks),
      sums AS (
        SELECT doc_id,
          $sums
        FROM hs GROUP BY doc_id),
      pairs AS (
        SELECT l.doc_id AS a, r.doc_id AS b, ($dist) AS dist
        FROM sums l JOIN sums r ON l.doc_id < r.doc_id)
      SELECT a, b, dist FROM pairs WHERE dist <= 3 ORDER BY a, b"""
  }
}
