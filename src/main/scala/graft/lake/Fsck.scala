package graft.lake

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Table integrity checker (CLI `fsck <root> [deep]`) — the tool an operator
  * runs before trusting a migration, after an incident, or on a schedule
  * against a 100 TB table. The reference trusts its warehouse's own
  * consistency (a teleport table IS a Postgres/Redshift table); this engine
  * owns its table format, so it owns the invariants too.
  *
  * Default checks are METADATA-ONLY — O(retained versions + manifests +
  * one `data/` listing) driver-side IO, no data read, safe on any size:
  *
  *  - snapshot chain: every retained version parses, records its own
  *    version, links to its parent, never decreases the watermark, and
  *    keeps the persisted key/bucket layout consistent with its parent
  *    (rebucket commits excepted by design);
  *  - manifest integrity (current snapshot): every [[ManifestRef]]'s
  *    file/row/byte totals match its manifest's entries, every entry's
  *    bucket lies in the ref's group under the persisted granule, and no
  *    file path is referenced twice;
  *  - file existence + size: every file referenced by ANY retained snapshot
  *    exists in `data/` with exactly its recorded byte length (one listing,
  *    set-joined driver-side); unreferenced on-disk files are counted as
  *    orphans (informational — that is vacuum's backlog, not corruption).
  *
  * `deep = true` adds one DISTRIBUTED scan of the current snapshot (cost:
  * one pass over the table, map-side combined to O(files) driver rows):
  * every row must live in the bucket its key hashes to under the recorded
  * layout (a misplaced row silently escapes bucket-pruned merges and point
  * lookups — the worst kind of corruption, invisible until a key collides),
  * per-file row counts must match the manifest, and no stored `_lsn` may
  * exceed the snapshot's watermark (fencing reads it as "already applied").
  */
object Fsck {

  case class Report(problems: List[String], versionsChecked: Int,
      manifestsChecked: Int, filesChecked: Int, orphanDataFiles: Int,
      deepRowsChecked: Long) {
    def ok: Boolean = problems.isEmpty
    def summary: String =
      s"${if (ok) "OK" else s"${problems.size} problem(s)"} — " +
        s"$versionsChecked version(s), $manifestsChecked manifest(s), " +
        s"$filesChecked file(s), $orphanDataFiles orphan data file(s)" +
        (if (deepRowsChecked >= 0) s", $deepRowsChecked row(s) deep-checked" else "")
  }

  private implicit val formats: Formats = DefaultFormats

  /** @param keyCols the key layout to deep-check bucket assignment against
    *        (callers pass the table's effective key — e.g.
    *        `CdcPipeline.effectiveKeys(snapshot)`); only used when `deep`. */
  def apply(table: LakeTable, keyCols: Seq[String] = Nil,
      deep: Boolean = false): Report = {
    val fs = table.fs
    val root = new HPath(table.root)
    val metaDir = new HPath(root, "meta")
    val dataDir = new HPath(root, "data")
    val problems = List.newBuilder[String]

    // --- snapshot chain (raw records: no manifest inflation) ---------------
    val versions = table.versions
    if (versions.isEmpty)
      return Report(List(s"no snapshots under $metaDir"), 0, 0, 0, 0, -1L)
    val raws = versions.map { v =>
      v -> Snapshot.fromJson(
        LakeTable.readString(fs, new HPath(metaDir, s"snapshot-$v.json")))
    }
    raws.foreach { case (v, s) =>
      if (s.version != v)
        problems += s"snapshot-$v.json records version ${s.version}"
    }
    raws.sliding(2).foreach {
      case List((pv, ps), (v, s)) =>
        if (s.parentVersion != pv)
          problems += s"version $v links parent ${s.parentVersion}, expected $pv"
        if (s.watermarkLsn < ps.watermarkLsn)
          problems += s"version $v watermark ${s.watermarkLsn} regressed below " +
            s"parent's ${ps.watermarkLsn}"
        // key/bucket layout may only change through rebucket (which rewrites
        // every file); a layout drift with REUSED parent manifests is the
        // corruption the persisted-granule rule exists to prevent
        if ((s.numBuckets != ps.numBuckets || s.keyCols != ps.keyCols) &&
            s.manifests.exists(m => ps.manifests.exists(_.path == m.path)))
          problems += s"version $v changed the bucket layout " +
            s"(${ps.numBuckets}/${ps.keyCols.mkString(",")} → " +
            s"${s.numBuckets}/${s.keyCols.mkString(",")}) but reuses parent manifests"
      case _ => ()
    }

    // --- manifest integrity, current snapshot ------------------------------
    val (curV, curRaw) = raws.last
    val manifestFiles: List[(ManifestRef, List[DataFile])] = curRaw.manifests.map { ref =>
      ref -> Serialization.read[List[DataFile]](
        LakeTable.readString(fs, new HPath(metaDir, ref.path)))
    }
    manifestFiles.foreach { case (ref, entries) =>
      if (entries.size != ref.files || entries.map(_.rows).sum != ref.rows ||
          entries.map(_.bytes).sum != ref.bytes)
        problems += s"${ref.path}: ref records files=${ref.files}/rows=${ref.rows}/" +
          s"bytes=${ref.bytes} but entries sum to ${entries.size}/" +
          s"${entries.map(_.rows).sum}/${entries.map(_.bytes).sum}"
      if (curRaw.bucketsPerGroup > 0)
        entries.filter(_.bucket / curRaw.bucketsPerGroup != ref.group).foreach(f =>
          problems += s"${ref.path}: ${f.path} (bucket ${f.bucket}) is outside " +
            s"group ${ref.group} at granule ${curRaw.bucketsPerGroup}")
    }
    val curFiles: List[DataFile] =
      if (curRaw.manifests.nonEmpty) manifestFiles.flatMap(_._2)
      else curRaw.files // legacy inline form
    curFiles.groupBy(_.path).filter(_._2.size > 1).keys.foreach(p =>
      problems += s"version $curV references $p more than once")

    // --- file existence + byte length across ALL retained versions --------
    val onDisk: Map[String, Long] =
      if (fs.isDirectory(dataDir))
        // files only: `.staging-*` DIRECTORIES left by crashed writers (and
        // any other non-file entry) would otherwise inflate orphanDataFiles
        // and record a directory's getLen as a file length
        fs.listStatus(dataDir).filter(_.isFile)
          .map(st => st.getPath.getName -> st.getLen).toMap
      else Map.empty
    // older versions via the inflating reader (shared manifest cache)
    val referenced = scala.collection.mutable.Map.empty[String, Long]
    versions.dropRight(1).foreach { v =>
      table.snapshot(v).files.foreach(f => referenced(f.path) = f.bytes)
    }
    curFiles.foreach(f => referenced(f.path) = f.bytes)
    referenced.toSeq.sortBy(_._1).foreach { case (path, bytes) =>
      onDisk.get(path) match {
        case None => problems += s"referenced data file missing on disk: $path"
        case Some(len) if len != bytes =>
          problems += s"$path: manifest records $bytes bytes, on disk $len"
        case _ => ()
      }
    }
    val orphans = onDisk.keySet.diff(referenced.keySet).size

    // --- deep: one distributed pass over the current snapshot --------------
    var deepRows = -1L
    if (deep && curFiles.nonEmpty) {
      require(keyCols.nonEmpty, "deep fsck needs the table's key columns")
      val byName = curFiles.map(f => f.path -> f).toMap
      val hasLsn = curRaw.schema.fieldNames.contains(graft.model.CdcModel.RowLsnCol)
      // pin the scan to the SAME version the metadata pass validated — a
      // concurrent commit between the two passes would otherwise make a
      // healthy live table read as corrupted (files not in byName, rows
      // above the pinned watermark, rewritten-bucket count mismatches)
      val df = table.readAt(curV).select(
        input_file_name().as("_f"),
        LakeTable.bucketExpr(keyCols, curRaw.numBuckets).as("_b"),
        (if (hasLsn) col(graft.model.CdcModel.RowLsnCol) else lit(-1L)).as("_l"))
      val perFile = df.groupBy("_f", "_b")
        .agg(count(lit(1)).as("_n"), max("_l").as("_maxl"))
        .collect() // O(files) rows: each file should hold exactly one bucket
      deepRows = perFile.map(_.getLong(2)).sum
      val seenRows = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      perFile.foreach { r =>
        val name = r.getString(0).split('/').last
        val (bucket, n, maxL) = (r.getInt(1), r.getLong(2), r.getLong(3))
        seenRows(name) += n
        byName.get(name) match {
          case None => problems += s"deep: scanned unreferenced file $name"
          case Some(f) if f.bucket != bucket =>
            problems += s"deep: $name holds $n row(s) hashing to bucket $bucket, " +
              s"file is assigned bucket ${f.bucket} — bucket-pruned reads miss them"
          case _ => ()
        }
        if (hasLsn && maxL > curRaw.watermarkLsn)
          problems += s"deep: $name holds _lsn $maxL above the snapshot " +
            s"watermark ${curRaw.watermarkLsn} — fencing would misread it as applied"
      }
      byName.foreach { case (name, f) =>
        if (seenRows(name) != f.rows)
          problems += s"deep: $name scanned ${seenRows(name)} row(s), " +
            s"manifest records ${f.rows}"
      }
    }

    Report(problems.result(), versions.size, manifestFiles.size,
      referenced.size, orphans, deepRows)
  }
}
