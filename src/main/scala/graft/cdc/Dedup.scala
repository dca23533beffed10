package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.CdcModel

/** Per-key change-event deduplication + last-writer-wins resolution.
  *
  * Generalizes the reference's delete-then-insert upsert (the implicit
  * "last load wins" of /root/reference/dialect.go:26-29,37-40,48-50) and the
  * ModifiedOnly lookback dedup (/root/reference/database.go:179-187) into an
  * explicit LWW reduction: one surviving event per (repo, path, commit),
  * chosen by the total order [[graft.model.CdcModel.orderKey]]
  * (lsn, op-rank, content) so LSN collisions resolve deterministically.
  *
  * Implementation note (scale): `groupBy(key).agg(max_by(...))` instead of a
  * window + row_number — max_by does map-side partial aggregation, so a batch
  * with heavy per-key duplication (retransmits, hot files) shrinks *before*
  * the shuffle; a window would shuffle and sort every duplicate. At 10^10
  * events this is the difference between shuffling the dedup survivors
  * (~#keys) and shuffling the whole stream.
  */
object Dedup {

  /** One winning event per key. Input: event-schema DataFrame (possibly with
    * extra payload columns — all non-key, non-lsn, non-op columns ride along
    * inside the max_by struct). Output: same schema, ≤1 row per key.
    */
  def lastWriterWins(events: DataFrame): DataFrame = {
    val keyCols = CdcModel.KeyCols
    val payloadCols = events.columns.filterNot(keyCols.contains).toSeq
    val winner = max_by(struct(payloadCols.map(col): _*), CdcModel.orderKey(events))
    events
      .groupBy(keyCols.map(col): _*)
      .agg(winner.as("_w"))
      .select(keyCols.map(col) ++ payloadCols.map(c => col(s"_w.$c").as(c)): _*)
  }

  /** Drop events at or below the already-applied LSN watermark (a replayed
    * tail after checkpoint recovery). Pure performance guard: correctness
    * never depends on it because MERGE is idempotent via the per-row stored
    * LSN — but skipping already-applied events avoids re-reading their
    * target buckets. ≙ the reference's `modified_at > cutoff` predicate
    * (/root/reference/database.go:179-187) keyed on LSN instead of wall-clock.
    */
  def aboveWatermark(events: DataFrame, watermarkLsn: Long): DataFrame =
    if (watermarkLsn < 0) events else events.filter(col(CdcModel.LsnCol) > watermarkLsn)
}
