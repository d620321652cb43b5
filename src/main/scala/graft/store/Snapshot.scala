package graft.store

/** Filesystem fingerprints for session-scoped memo invalidation.
  *
  * Expensive shared scans (the blocked embedding pair scan, the verified
  * near-dup pair graph) are memoized per session; the memo key carries a
  * fingerprint of the source table's files so a REWRITTEN table rebuilds
  * the memo instead of silently serving stale results (r5 advice on
  * pairCache). Path, size, and mtime of every data file — the same
  * signal table formats use for snapshot identity — xor-folded so the
  * fingerprint is order-independent under directory listing.
  */
private[graft] object Snapshot {

  /** 0L is the MISSING-dir sentinel, distinct from the empty-fold value
    * 17L of an existing-but-empty dir: memo consumers (replay cache
    * key, orcRoot, ScaleBench markers) must see the missing→created
    * transition as an invalidation (r15 advice).
    */
  def fingerprint(dir: String, table: String): Long =
    fingerprintPath(s"$dir/$table")

  /** [[fingerprint]] for a full path (file or directory) — the form the
    * query-side gate memo uses on scan roots harvested from a plan.
    */
  def fingerprintPath(path: String): Long =
    if (!Fs.exists(path)) 0L
    else Fs.listFilesRecursive(path)
      .map(e => (e.path.hashCode.toLong * 1000003L)
        ^ e.len
        ^ java.lang.Long.rotateLeft(e.mtime, 17))
      .foldLeft(17L)(_ ^ _)
}
