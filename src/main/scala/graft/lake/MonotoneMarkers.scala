package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Durable monotone high-water markers: one `<prefix><version><suffix>` file
  * per recorded value, create-exclusive (atomic on every Hadoop FileSystem).
  * The recorded value is the MAX marker present; each advance prunes the
  * markers it supersedes best-effort, so the directory holds O(1) files on a
  * healthy writer. A crash can only LOSE the newest marker — never corrupt
  * one — and the consumers of this scheme ([[graft.cdc.CdcFeed]]'s feed
  * offsets, [[graft.streaming.LakeSource]]'s capped-offer base) are
  * idempotent over a re-presented value by construction.
  */
final class MonotoneMarkers(prefix: String, suffix: String = "") {

  private val Name =
    (java.util.regex.Pattern.quote(prefix) + "([0-9]+)" +
      java.util.regex.Pattern.quote(suffix)).r

  /** MAX recorded value, or -1 when none (missing dir included). */
  def readMax(fs: FileSystem, dir: HPath): Long =
    if (!fs.isDirectory(dir)) -1L
    else fs.listStatus(dir).iterator
      .map(_.getPath.getName)
      .collect { case Name(v) => v.toLong }
      .foldLeft(-1L)(math.max)

  /** Record `v` durably (an IO failure propagates — callers rely on the
    * marker existing before acting on the value), then prune superseded
    * markers best-effort (a crash mid-prune leaves extras the next advance
    * removes; readMax takes the max either way). Losing the create race is
    * fine: the value was already recorded. */
  def advance(fs: FileSystem, dir: HPath, v: Long, content: String = ""): Unit = {
    if (!fs.isDirectory(dir)) fs.mkdirs(dir)
    LakeTable.writeStringExclusive(fs, new HPath(dir, s"$prefix$v$suffix"), content)
    try fs.listStatus(dir).foreach { st =>
      st.getPath.getName match {
        case Name(o) if o.toLong < v => fs.delete(st.getPath, false)
        case _ => ()
      }
    } catch { case _: java.io.IOException => () }
  }
}
