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

  def fingerprint(dir: String, table: String): Long =
    Fs.listFilesRecursive(s"$dir/$table")
      .map(e => (e.path.hashCode.toLong * 1000003L)
        ^ e.len
        ^ java.lang.Long.rotateLeft(e.mtime, 17))
      .foldLeft(17L)(_ ^ _)
}
