package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Shared on-disk machinery for the versioned bucket-manifest layout
  * used by every materializing sink ([[UpsertSink]], [[JoinView]],
  * [[AggView]]):
  *
  * {{{
  *   dir/
  *     v12/__bucket=3/part-*.parquet   bucket 3 as of batch 12
  *     v17/__bucket=3/part-*.parquet   bucket 3 rewritten by batch 17
  *     v17.manifest                    "3 v17/__bucket=3\n5 v12/__bucket=5\n…"
  *     _META                           "numBuckets=64"  (fixed at creation)
  *     _CURRENT                        "v17"
  * }}}
  *
  * The layout gives every sink the same three properties:
  *  - **atomic publish** on any filesystem with atomic small-file
  *    writes (tmp + ATOMIC_MOVE pointer flip; on an object store you'd
  *    swap the pointer for a table-format transaction-log commit — the
  *    merge plans are unchanged);
  *  - **structural sharing**: untouched buckets keep their previous
  *    version's directories via the manifest (no copy, no read), so a
  *    micro-batch costs O(batch + touched-bucket data), never O(table);
  *  - **replay idempotence**: the published batch id is recoverable
  *    from the current manifest's `batch <id>` line (older layouts:
  *    from the `v<batchId>` version name), so a crash between pointer
  *    flip and streaming-checkpoint commit replays as a no-op.
  *
  * Manifest lines a sink doesn't recognize are tolerated by every
  * parser here ([[JoinView]] adds a `dim <dir>` line); torn lines from
  * pre-atomic-write crashes are skipped, not a crash — the pruner must
  * never die on an orphan it exists to clean.
  */
private[graft] object ViewLayout {

  val currentFile = "_CURRENT"
  val metaFile = "_META"

  /** Atomic small-file write: tmp + ATOMIC_MOVE. A crash mid-write can
    * never leave a torn file visible. */
  def writeAtomic(dir: String, name: String, body: String): Unit = {
    val tmp = Paths.get(dir, s".$name.tmp")
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, Paths.get(dir, name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  def currentVersion(dir: String): Option[String] = {
    val p = Paths.get(dir, currentFile)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8").trim)
    else None
  }

  /** The recorded bucket count, if the view has ever published.
    * `numBuckets` is part of the layout: rows land in `pmod(hash, n)`
    * buckets, so merging with a DIFFERENT n would look keys up in the
    * wrong buckets and silently resurrect stale rows. */
  def storedNumBuckets(dir: String): Option[Int] = {
    val p = Paths.get(dir, metaFile)
    if (!Files.exists(p)) None
    else new String(Files.readAllBytes(p), "UTF-8").linesIterator
      .collectFirst { case s if s.startsWith("numBuckets=") =>
        s.stripPrefix("numBuckets=").trim.toInt }
  }

  /** Enforce the pinned bucket count before a merge touches anything. */
  def requireSameBuckets(dir: String, numBuckets: Int, what: String): Unit =
    storedNumBuckets(dir).foreach { stored =>
      require(stored == numBuckets,
        s"$what at $dir was created with numBuckets=$stored; merge called " +
          s"with numBuckets=$numBuckets — the bucket count is fixed at " +
          "creation (rehashing would corrupt the merge)")
    }

  /** Highest published version number (from the manifest files —
    * orphan data dirs from a pre-publish crash don't count, so a
    * replay re-uses and Overwrites the orphan's number). */
  def maxVersion(dir: String): Option[Long] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.matches("v\\d+\\.manifest"))
      .map(_.getName.stripSuffix(".manifest").drop(1).toLong)
      .sorted.lastOption

  /** Next version name to publish under. Version numbers are a PUBLISH
    * COUNTER, not batch ids — decoupled so a non-batch publication
    * (e.g. [[UpsertSink.rebucket]]) can slot between batches without
    * colliding with the engine's future batch ids. While a stream is
    * the only publisher the two coincide (batch ids are contiguous
    * from 0). */
  def nextVersion(dir: String): String = s"v${maxVersion(dir).map(_ + 1).getOrElse(0L)}"

  /** The batch id recorded in `version`'s manifest (`batch <id>` line —
    * skipped as a non-bucket line by every other parser). */
  def manifestBatch(dir: String, version: String): Option[Long] =
    manifestLines(dir, version).collectFirst {
      case s if s.startsWith("batch ") => s.stripPrefix("batch ").trim.toLong
    }

  /** The batch id that published the CURRENT version — the replay-
    * idempotence token. Back-compat: layouts from before the publish
    * counter named versions `v<batchId>` directly with no batch line,
    * so fall back to parsing the version name. */
  def publishedBatch(dir: String): Option[Long] =
    currentVersion(dir).flatMap { v =>
      manifestBatch(dir, v)
        .orElse(Some(v.drop(1)).filter(_.forall(_.isDigit)).map(_.toLong))
    }

  /** All non-empty manifest lines for `version` (raw — for sinks with
    * extra non-bucket lines). */
  def manifestLines(dir: String, version: String): Seq[String] = {
    val p = Paths.get(dir, s"$version.manifest")
    if (!Files.exists(p)) Seq.empty
    else new String(Files.readAllBytes(p), "UTF-8").linesIterator
      .filter(_.nonEmpty).toSeq
  }

  /** Manifest for `version`: bucket id → view-relative data dir.
    * Non-`<int> <dir>` lines (torn writes, sink-specific extras) are
    * skipped. */
  def readBucketManifest(dir: String, version: String): Map[Int, String] =
    manifestLines(dir, version).flatMap { line =>
      line.split(" ", 2) match {
        case Array(b, d) if b.nonEmpty && b.forall(_.isDigit) && d.nonEmpty =>
          Some(b.toInt -> d)
        case _ => None
      }
    }.toMap

  /** Scan the `__bucket=N` directories the parquet writer actually
    * materialized under `dir/relPath` (a touched bucket that came back
    * EMPTY — every key deleted — writes no dir and simply leaves the
    * manifest). Returns bucket id → view-relative dir. */
  def writtenBuckets(dir: String, relPath: String): Map[Int, String] =
    Option(new java.io.File(s"$dir/$relPath").listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
      .map(f => f.getName.stripPrefix("__bucket=").toInt -> s"$relPath/${f.getName}")
      .toMap

  /** Delete manifests beyond the newest `retain` (min 2: a reader that
    * resolved the pointer just before a flip may still be scanning the
    * previous version) and every `v*` directory no retained manifest
    * references — including orphans from a crash before a pointer
    * flip. `liveDirsOf` maps a retained version to the view-relative
    * dirs its manifest references (sink-specific: JoinView adds the
    * dim dir). */
  def pruneVersions(dir: String, retain: Int)
                   (liveDirsOf: String => Iterable[String]): Unit = {
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
      f.delete(); ()
    }
    val root = new java.io.File(dir)
    val manifests = Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.matches("v\\d+\\.manifest"))
      .sortBy(_.getName.stripSuffix(".manifest").drop(1).toLong)
    val (dead, retained) = manifests.splitAt(manifests.length - math.max(retain, 2))
    val live = retained.map(_.getName.stripSuffix(".manifest"))
      .flatMap(liveDirsOf).map(_.split("/", 2).head).toSet
    dead.foreach(_.delete())
    Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.matches("v\\d+") && !live.contains(f.getName))
      .foreach(deleteRec)
  }
}
