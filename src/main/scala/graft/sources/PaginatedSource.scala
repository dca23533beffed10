package graft.sources

import scala.annotation.tailrec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Error classification of the reference's API extractor
  * (/root/reference/api.go:29-45, 479-493; workflow exit codes
  * workflow.go:29-35): network/5xx → retryable, 4xx/invalid body → fatal. */
sealed trait FetchError extends Product with Serializable { def retryable: Boolean }
object FetchError {
  case class Network(msg: String) extends FetchError { val retryable = true }
  case class Http5xx(code: Int) extends FetchError { val retryable = true }
  // 4xx is fatal by default; `ErrorHandling({Http4XXError: Retry})` flips the
  // flag but keeps the error's 4xx IDENTITY (logs must not report a 404 as 5xx)
  case class Http4xx(code: Int, retryable: Boolean = false) extends FetchError
  case class InvalidBody(msg: String) extends FetchError { val retryable = false }
}

/** One page of records + the continuation token for the next pull, or None
  * when exhausted. ≙ the Paginate Starlark hook returning an offset dict or
  * None (/root/reference/api.go:371-426). */
case class Page(records: Seq[String], nextOffset: Option[Long])

/** A fetch that exhausted its retries (retryable error) or hit a fatal one.
  * Carries the classified [[FetchError]] so callers can map it to the
  * reference's workflow exit codes — Fail=3, Retry=4 (workflow.go:29-35). */
class FetchFailedException(val error: FetchError, offset: Long)
  extends RuntimeException(
    s"fetch at offset $offset failed (${if (error.retryable) "retryable" else "fatal"}): $error")

/** Pull-based paginated record source — the reference's HTTP API extractor
  * (`requestAllPages`, api.go:176-243) re-expressed as a checkpointable
  * micro-batch puller. The fetch function is pluggable (an HTTP client in
  * production; an in-memory fake in this offline sandbox — the protocol,
  * offset management, retry classification and batch assembly are the real,
  * tested parts).
  *
  * Unlike the reference, pages stream into bounded micro-batches instead of
  * accumulating the entire result set in driver memory (api.go:178-227 holds
  * all rows in a slice — the structural flaw micro-batching removes).
  */
final class PaginatedSource(
    fetch: Long => Either[FetchError, Page],
    maxRetries: Int = 3,
    pagesPerBatch: Int = 100) {

  /** Pull one micro-batch starting at `offset`. Returns (records, nextOffset)
    * where nextOffset = None means the source is exhausted. Retryable errors
    * are retried up to maxRetries then thrown (≙ exit code 4, retry later);
    * fatal errors throw immediately (≙ exit code 3). */
  def pullBatch(offset: Long): (Seq[String], Option[Long]) = {
    @tailrec def fetchRetry(off: Long, attempt: Int): Page =
      fetch(off) match {
        case Right(p) => p
        case Left(e) if e.retryable && attempt < maxRetries => fetchRetry(off, attempt + 1)
        case Left(e) => throw new FetchFailedException(e, off)
      }
    @tailrec def loop(off: Long, pages: Int, acc: Vector[String]): (Seq[String], Option[Long]) = {
      val page = fetchRetry(off, 0)
      val recs = acc ++ page.records
      page.nextOffset match {
        // a continuation that does not ADVANCE would re-fetch the same page
        // forever (a server echoing a constant offset field, or a paginated
        // url missing its {offset} token) — and in runApi each lap commits a
        // snapshot, growing the table without bound. Fail loudly instead.
        case Some(n) if n <= off => throw new FetchFailedException(
          FetchError.InvalidBody(s"non-advancing pagination: offset $off → $n"), off)
        case None => (recs, None)
        case Some(n) if pages + 1 >= pagesPerBatch => (recs, Some(n))
        case Some(n) => loop(n, pages + 1, recs)
      }
    }
    loop(offset, 0, Vector.empty)
  }

  /** Drain everything from `offset`, streaming each bounded micro-batch into
    * `sink` AS IT IS PULLED — driver memory stays O(pagesPerBatch · pageSize)
    * no matter how long the source is (the reference holds the entire result
    * set in one slice, api.go:178-227 — the structural flaw this removes; an
    * earlier version of this method re-created it with a driver Vector).
    * ≙ extract-load-api end-to-end (api.go:47-76) with the CSV bounce
    * removed. Returns (batches delivered, records delivered). */
  /** @param emptyIsNull pass true for CSV-bodied endpoints: their empty
    *        fields mean NULL (the EMPTYASNULL rule JobRunner's page path
    *        applies) — left false, any empty field in a non-string column
    *        raises where the load path would store NULL. */
  def drain(spark: SparkSession, schema: StructType,
      sink: DataFrame => Unit, offset: Long = 0L,
      emptyIsNull: Boolean = false): (Int, Long) = {
    @tailrec def loop(off: Long, batches: Int, records: Long): (Int, Long) = {
      val (recs, next) = pullBatch(off)
      if (recs.nonEmpty)
        // text-first read + loud cast (Endpoint.typedFrame), NOT a
        // schema-first JSON parse — the latter silently nulls
        // string-encoded scalars ({"id": "123"} against LongType)
        sink(Endpoint.typedFrame(spark, schema, recs, emptyIsNull))
      val (b, r) = (batches + (if (recs.nonEmpty) 1 else 0), records + recs.size)
      next match {
        case None => (b, r)
        case Some(n) => loop(n, b, r)
      }
    }
    loop(offset, 0, 0L)
    // (checkpoint-resuming consumers that need each batch's nextOffset —
    // JobRunner.runApi — drive pullBatch directly instead)
  }
}
