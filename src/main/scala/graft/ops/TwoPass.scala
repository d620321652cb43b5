package graft.ops

import org.apache.spark.rdd.RDD

/** The two-pass range-partitioned prefix fold shared by every global
  * rank / cumulative-sum operator (`Corpus.curriculum`,
  * `Corpus.ppsSystematicSample`, `Linkage.sortedNeighborhoodPairs`):
  * pass 1 folds each sorted partition into ONE driver row — a
  * numPartitions-sized artifact, never data — and prefix-scans those
  * into per-partition starting offsets; pass 2 then streams each
  * partition seeded with its offset. This is the scale-correct
  * alternative to an unpartitioned window (which plans SinglePartition)
  * for global order statistics, and lives in one place so fixes to the
  * scaffold (empty partitions, fold guards) apply to every caller.
  */
object TwoPass {

  /** (offsets, total): offsets(i) = `plus`-fold of per-row `add` over
    * every row in partitions before i; total = the fold over all rows.
    * `sorted` should already be range-partitioned + sorted (and
    * checkpointed if pass 2 re-reads it — every current caller does).
    * `add` runs once per row on executors; a throwing `add` (e.g. a
    * validity require) surfaces in pass 1, before any output is built.
    */
  def prefixAndTotal[T, S](sorted: RDD[T], zero: S, add: (S, T) => S,
                           plus: (S, S) => S): (IndexedSeq[S], S) = {
    val parts = sorted.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.foldLeft(zero)(add)))
    }.collect().sortBy(_._1).toIndexedSeq.map(_._2)
    val scan = parts.scanLeft(zero)(plus)
    (scan.init, scan.last)
  }
}
