package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSparkInternals
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.cdc.CdcFeed
import graft.lake.LakeTable

/** Table version as a Structured Streaming offset (checkpoint-serialized). */
case class LakeSourceOffset(version: Long) extends OffsetV1 {
  override def json: String = s"""{"version":$version}"""
}

object LakeSourceOffset {
  private val VersionRe = """\{\s*"version"\s*:\s*(-?\d+)\s*\}""".r
  def fromJson(s: String): LakeSourceOffset = s.trim match {
    case VersionRe(v) => LakeSourceOffset(v.toLong)
    case other => throw new IllegalArgumentException(s"not a LakeSourceOffset: $other")
  }
  def of(o: org.apache.spark.sql.connector.read.streaming.Offset): LakeSourceOffset = o match {
    case l: LakeSourceOffset => l
    case other => fromJson(other.json)
  }
}

/** A LakeTable as a native Structured Streaming SOURCE — the table's commit
  * history becomes a stream any Spark streaming query can consume:
  *
  * {{{
  * spark.readStream
  *   .format("graft.streaming.LakeSourceProvider")   // or short name "graft-table"
  *   .option("path", tableRoot)
  *   .option("maxVersionsPerBatch", 8)               // optional admission control
  *   .load()                                          // lsn, op, <payload…>
  *   .groupBy(window(...), ...).agg(...)              // watermarks, state, any sink
  * }}}
  *
  * Offsets ARE table versions: `getOffset` = the version hint's one GET,
  * `getBatch(v1, v2)` = [[LakeTable.readAppends]] in event shape
  * ([[CdcFeed.asEvents]] — tombstones arrive as `op = 'D'` rows), so a
  * micro-batch costs O(files added in the range) — never a table scan. The
  * engine's checkpoint makes delivery exactly-once to transactional sinks
  * (the same contract as Spark's file source; this is the v1 `Source` API —
  * the same surface Delta Lake's streaming source ships on — because v1
  * lets `getBatch` hand Spark a whole DataFrame plan; DSv2's
  * `MicroBatchStream` would force a hand-rolled parquet PartitionReader).
  *
  * Semantics riders (both documented Delta behaviors too):
  *  - merge-on-read sources stream EXACT per-commit change sets; a
  *    copy-on-write rewrite re-delivers the rewritten buckets' untouched
  *    rows (downstream must be LWW/idempotent, e.g. a [[CdcFeed]]-shaped
  *    merge or an aggregation in update mode);
  *  - the schema is pinned when the stream starts (evolution requires a
  *    restart);
  *  - a checkpointed offset that has been vacuumed away FAILS the stream
  *    (restart with a fresh checkpoint to resync) — silently resyncing
  *    would duplicate the whole table into append-mode sinks.
  *
  * Admission control: `.option("maxVersionsPerBatch", N)` caps how many table
  * versions one micro-batch may span (the Delta `maxFilesPerTrigger` /
  * `maxFilesPerTrigger`-file-source analogue, in this source's natural unit —
  * offsets ARE versions). Without it a consumer that starts on (or falls
  * behind) a long-lived table gets EVERY pending commit coalesced into ONE
  * micro-batch — at sustained ingest that is an unbounded catch-up batch that
  * can exceed executor memory and stalls the trigger cadence; with it,
  * catch-up proceeds in bounded, checkpointed steps. A v1 source's offered
  * offset must never move BACKWARD across a restart (the engine logs it and
  * diffs it against the committed offset by equality, so a regressed offer
  * would run a spurious batch), so the capped offer is persisted as a tiny
  * monotone high-water marker under the source's own checkpoint directory —
  * the same self-logging contract `FileStreamSource` uses; unlimited mode
  * (the default) keeps the marker-free zero-IO path. Under
  * `Trigger.AvailableNow` Spark pins the end offset once at start, so there
  * the cap bounds the RUN, not each batch — a rerun drains the next ≤N
  * versions (bounded cron pulls).
  *
  * Starting point: `.option("startingVersion", N)` (or `"latest"`) starts a
  * FRESH stream from table version N exclusive — deliveries begin at commit
  * N+1 — instead of the default full initial sync from version -1 (the Delta
  * streaming-source option of the same name). `"latest"` resolves to the
  * table's current version at stream start: "follow from now", the natural
  * shape for a monitoring/alerting consumer that doesn't want 100 TB of
  * history replayed into its first batch. Only consulted when the checkpoint
  * holds no offset yet — a restarted stream always resumes from its
  * checkpoint. The versions above N must still be retained: a vacuumed range
  * fails loudly exactly like a lagging checkpoint (never a silent resync).
  */
final class LakeSource(spark: SparkSession, root: String,
    maxVersionsPerBatch: Int = Int.MaxValue, metadataPath: String = "",
    startingVersion: Long = -1L) extends Source {

  require(maxVersionsPerBatch >= 1, s"maxVersionsPerBatch must be >= 1 (got $maxVersionsPerBatch)")
  require(startingVersion >= -1L,
    s"startingVersion must be a version >= 0, or -1 for the full-sync default (got $startingVersion)")

  private val table = LakeTable(root)(spark)

  // The starting point, pinned ONCE per stream: `startingVersion` arrives
  // re-resolved on every restart (`"latest"` maps to the table's CURRENT
  // version), so the first resolution is persisted create-exclusive under
  // the source's checkpoint dir and every later construction reads it back.
  // Without this, a restart of a `latest` stream would move the anchor to
  // wherever the table is NOW — flooring the rate-limit base past the
  // committed offset (one unbounded catch-up batch, exactly what
  // maxVersionsPerBatch exists to prevent) and, on the delivery side,
  // skipping or re-including versions the stream contract has already fixed.
  private val anchor: Long =
    if (startingVersion < 0 || metadataPath.isEmpty) startingVersion
    else {
      val dir = new org.apache.hadoop.fs.Path(metadataPath, "graft-start")
      val fs = dir.getFileSystem(table.hconf)
      if (!fs.isDirectory(dir)) fs.mkdirs(dir)
      val f = new org.apache.hadoop.fs.Path(dir, "anchor")
      // losing the create race means an anchor already exists — it wins
      LakeTable.writeStringExclusive(fs, f, startingVersion.toString)
      LakeTable.readString(fs, f).trim.toLong
    }

  // pinned at stream start; evolution requires a restart (Delta semantics)
  override val schema: StructType = LakeSource.eventSchema(spark, table)

  private val rateLimited = maxVersionsPerBatch != Int.MaxValue
  private val markerDir: Option[org.apache.hadoop.fs.Path] =
    Option.when(rateLimited && metadataPath.nonEmpty)(
      new org.apache.hadoop.fs.Path(metadataPath, "graft-offered"))
  private def markerFs = markerDir.map(_.getFileSystem(table.hconf))

  // highest version this source has OFFERED to the engine — the rate-limit
  // base. Re-seeded from the markers on restart so a capped offer can never
  // regress below one the engine already logged; getBatch also advances it
  // (covers recovery replays and pre-marker checkpoints). The PINNED anchor
  // floors it so capped catch-up begins where delivery begins — a persisted
  // marker always wins over it, so a restart can never leap the base forward.
  @volatile private var offered: Long = math.max(readHighWater(), anchor)

  override def getOffset: Option[OffsetV1] = {
    val v = table.latestVersion
    if (v < 0) None
    else if (!rateLimited) Some(LakeSourceOffset(v))
    else {
      val end = math.min(v, offered + maxVersionsPerBatch.toLong)
      if (end > offered) { persistHighWater(end); offered = end }
      Some(LakeSourceOffset(offered))
    }
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    // no engine offset yet (first batch of a fresh checkpoint) → begin at
    // the pinned anchor (default -1 = full initial sync). The anchor also
    // FLOORS a logged offset: an uncapped stream started at anchor N above
    // the table's then-latest L checkpoints L from its first (empty) batch,
    // and an unclamped later batch (L, latest] would deliver versions in
    // (L, N] the contract excludes. Safe only because the anchor is pinned —
    // flooring by a restart-re-resolved "latest" would SKIP committed ranges.
    val from = math.max(
      start.map(LakeSourceOffset.of(_).version).getOrElse(-1L), anchor)
    val to = LakeSourceOffset.of(end).version
    // a recovery replay hands us offsets the engine logged before this
    // process existed — never offer below them (also seeds checkpoints
    // created before the marker scheme)
    if (to > offered) offered = to
    if (from >= to) {
      // recovery no-op (restart replays, multi-source alignment): zero rows
      // of the pinned schema, zero IO — a read() here would inflate the whole
      // current snapshot just to filter it away
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      return GraftSparkInternals.asStreamingFrame(spark, empty, schema)
    }
    // the ONE unrecoverable failure is a version expired by vacuum — catch
    // exactly what deletion produces (FileNotFound), so a transient IO error
    // (throttle, timeout) keeps its own exception and Spark's retry applies
    // instead of an operator being told to resync into duplicates
    val events =
      try CdcFeed.asEvents(table.readAppends(from, to))
      catch {
        case e: java.io.FileNotFoundException => throw new IllegalStateException(
          s"stream range ($from, $to] of $root has been vacuumed away (${e.getMessage}) — " +
          "the delta is unrecoverable; restart with a fresh checkpoint to resync " +
          "and size the table's retainSnapshots above the consumer's lag", e)
      }
    // align to the pinned schema — name AND type, so a column dropped or
    // retyped under the running stream fails loudly (Delta semantics) instead
    // of stamping a stale layout onto rows shaped by the new schema
    val drift = schema.fields.flatMap { f =>
      events.schema.fields.find(_.name == f.name) match {
        case None => Some(s"${f.name} dropped")
        case Some(g) if g.dataType != f.dataType =>
          Some(s"${f.name}: ${f.dataType.simpleString} → ${g.dataType.simpleString}")
        case _ => None
      }
    }
    if (drift.nonEmpty) throw new IllegalStateException(
      s"$root changed schema under a running stream (${drift.mkString("; ")}) — " +
      "restart the stream to adopt the new schema")
    GraftSparkInternals.asStreamingFrame(spark,
      events.select(schema.fieldNames.map(col).toIndexedSeq: _*), schema)
  }

  override def commit(end: OffsetV1): Unit = () // retention is vacuum's job
  override def stop(): Unit = ()
  override def toString: String = s"LakeSource[$root]"

  // --- capped-offer high-water markers: `v<version>` files via the shared
  // [[MonotoneMarkers]] scheme (a lost newest marker merely re-offers a
  // version the engine de-dups by equality). One tiny PUT per advancing
  // trigger — the same order of metadata IO as the engine's own offset log
  // entry for that batch. An advance IO failure propagates and fails the
  // trigger (Spark retries): an unpersisted capped offer could regress
  // after a restart.

  private def readHighWater(): Long = (for {
    dir <- markerDir
    fs <- markerFs
  } yield LakeSource.markers.readMax(fs, dir)).getOrElse(-1L)

  private def persistHighWater(v: Long): Unit = for {
    dir <- markerDir
    fs <- markerFs
  } LakeSource.markers.advance(fs, dir, v)
}

object LakeSource {
  // in the companion (not the class) so it exists before the constructor's
  // readHighWater() seed runs — a class-level val would still be null there
  private val markers = new graft.lake.MonotoneMarkers("v")

  /** The stream's row shape: `lsn`, `op`, then the stored payload columns in
    * table order — exactly [[CdcFeed.asEvents]]'s projection, derived from a
    * zero-row read so source and batches can never disagree. */
  private[streaming] def eventSchema(spark: SparkSession, table: LakeTable): StructType =
    CdcFeed.asEvents(table.read().filter(lit(false))).schema
}

/** `spark.readStream.format("graft.streaming.LakeSourceProvider")` (or the
  * short name `graft-table` when registered) — see [[LakeSource]]. */
final class LakeSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-table source needs .option(\"path\", <tableRoot>)"))

  private def maxVersionsOf(parameters: Map[String, String]): Int =
    parameters.get("maxVersionsPerBatch").map { s =>
      val n = s.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"maxVersionsPerBatch must be a positive integer (got '$s')"))
      require(n >= 1, s"maxVersionsPerBatch must be >= 1 (got $n)")
      n
    }.getOrElse(Int.MaxValue)

  /** `startingVersion`: a version number, or `latest` (resolved against the
    * table AT STREAM START — "follow from now"). Only consulted when the
    * checkpoint holds no offset yet. */
  private def startingVersionOf(parameters: Map[String, String],
      table: => LakeTable): Long =
    parameters.get("startingVersion").map {
      case "latest" => table.latestVersion
      case s => s.toLongOption.filter(_ >= 0).getOrElse(
        throw new IllegalArgumentException(
          s"startingVersion must be a non-negative version or 'latest' (got '$s')"))
    }.getOrElse(-1L)

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val root = rootOf(parameters)
    val table = LakeTable(root)(sqlContext.sparkSession)
    require(table.exists, s"no graft table at $root — create/replay it first")
    require(schema.isEmpty, "graft-table source derives its schema from the table; " +
      "don't pass .schema(...)")
    maxVersionsOf(parameters) // validate at load() time, not first trigger
    startingVersionOf(parameters, table)
    (shortName(), LakeSource.eventSchema(sqlContext.sparkSession, table))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val root = rootOf(parameters)
    new LakeSource(sqlContext.sparkSession, root,
      maxVersionsOf(parameters), metadataPath,
      startingVersionOf(parameters, LakeTable(root)(sqlContext.sparkSession)))
  }
}
