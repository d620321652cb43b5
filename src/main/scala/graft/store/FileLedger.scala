package graft.store

/** Compacted file-grain replay ledger for the ingest streams.
  *
  * Every replay-safe stream here records WHICH landing files it has
  * applied inside its versioned state snapshot, so a redelivered batch
  * (crash before checkpoint commit, or a wiped checkpoint that
  * redelivers the whole landing history) re-applies nothing. Stored
  * naively that ledger is one row per file EVER landed: a years-lived
  * stream collects millions of rows into the driver each batch and
  * rewrites all of them through `Versioned.overwrite` — per-batch cost
  * linear in stream AGE, the same growth class as an `IN (files…)`
  * filter, one level up.
  *
  * The fix is the standard log-compaction move: retire the applied
  * prefix behind a single high-watermark. The ledger becomes
  *
  *   - one `hwm` row: every landing file whose BASENAME is
  *     lexicographically ≤ the watermark is applied, and
  *   - one `file` row per applied file ABOVE the watermark (the open
  *     frontier: files applied out of name order, or names the landing
  *     dir still shows an unapplied neighbour below).
  *
  * The watermark only advances over names the landing directory proves
  * are all applied (`compact` takes the current listing), so in-flight
  * files — landed but not yet delivered by the stream — hold it back
  * and are never misclassified. Snapshot size is therefore bounded by
  * the open frontier plus the orphan window, NOT by total files landed;
  * after the stream catches up it is exactly one row.
  *
  * Naming contract (documented, standard landing-zone discipline — the
  * same one `Lake.archiveByFilenameDate`'s `pos_YYYYMMDD` names
  * presume): files arrive with LEXICOGRAPHICALLY increasing basenames.
  * That means zero-padded or fixed-width date/sequence stamps —
  * naturally-numbered names break it (`b10` sorts BELOW `b4`, so a
  * `b10.jsonl` landing after the watermark reached `b4.jsonl` would be
  * silently treated as already applied). A file landing later with a
  * name at or below the watermark is indistinguishable from a
  * checkpoint-wipe redelivery of a retired file — the ledger must
  * treat it as applied — so producers that cannot guarantee the
  * ordering must disable compaction: every ingest stream takes a
  * `compactLedger = false` flag that skips `compact` entirely and
  * keeps the uncompacted per-file ledger. (An EMPTY landing listing is
  * NOT an opt-out — with nothing pending the watermark advances over
  * everything applied, which is exactly right after archival empties
  * the landing dir.)
  *
  * Filesystem seam: the landing/table listings here (and in `Lake` /
  * the `MicroBatch` partition sweeps) go through [[Fs]] — the Hadoop
  * `FileContext` client — so a landing dir may be local, HDFS, or
  * object storage by path scheme. All of them are bounded, driver-side,
  * single-directory listings (S3 listing is strongly consistent, so
  * watermark advancement over a listing holds there; see Fs's
  * atomicity matrix). Nothing here walks trees or assumes atomic
  * rename beyond what the surrounding contracts document per call site.
  */
object FileLedger {

  /** `hwm`: retire-everything-at-or-below watermark over basenames;
    * `files`: applied full paths above the watermark.
    */
  final case class State(hwm: Option[String], files: Set[String]) {
    def applied(path: String): Boolean =
      files(path) || hwm.exists(basename(path) <= _)
  }

  val Empty: State = State(None, Set.empty)

  /** The name part of a landing path as the stream reports it
    * (`input_file_name()` URIs and plain paths both split on '/').
    */
  def basename(path: String): String = path.substring(path.lastIndexOf('/') + 1)

  /** Data-file basenames currently in the landing dir — the files the
    * stream could still deliver. Dot/underscore names are skipped
    * exactly as Spark's file source skips them. A driver-side listing
    * of ONE directory, the same order of work as the per-batch
    * `input_file_name` collect; landing dirs are archived/TTL'd, so
    * this is bounded by the landing retention, not stream age.
    */
  def landedBasenames(landingDir: String): Set[String] =
    Fs.list(landingDir)
      .filter(e => e.isFile && !e.name.startsWith(".") && !e.name.startsWith("_"))
      .map(_.name).toSet

  /** Fold newly applied files in and advance the watermark as far as
    * the landing listing allows: to the largest applied basename with
    * no unapplied landed basename at or below it. Per-file rows at or
    * below the new watermark retire. The watermark never regresses.
    */
  def compact(prev: State, newlyApplied: Set[String], landed: Set[String]): State = {
    val files = prev.files ++ newlyApplied
    val appliedB = files.map(basename)
    val pending = landed.filter(b => !appliedB(b) && !prev.hwm.exists(b <= _))
    val candidates = appliedB ++ prev.hwm
    val hwm =
      if (candidates.isEmpty) None
      else if (pending.isEmpty) Some(candidates.max)
      else {
        val below = candidates.filter(_ < pending.min)
        if (below.isEmpty) prev.hwm else Some(below.max)
      }
    State(hwm, files.filter(f => !hwm.exists(basename(f) <= _)))
  }

  /** Decode from the state snapshot's (kind, key) rows. Snapshots from
    * before compaction simply have no `hwm` row and load as the
    * uncompacted form — the first post-upgrade batch compacts them.
    */
  def fromRows(rows: Iterable[(String, String, Long)]): State =
    State(rows.collectFirst { case ("hwm", w, _) => w },
      rows.collect { case ("file", f, _) => f }.toSet)

  /** Encode as (kind, key, n) state rows, deterministic order. */
  def toRows(st: State): Seq[(String, String, Long)] =
    st.hwm.map(w => ("hwm", w, 0L)).toSeq ++
      st.files.toSeq.sorted.map(f => ("file", f, 0L))
}
