package graft.util

/** Shared nearest-rank quantile over a SORTED sequence:
  * `sorted(ceil(p·n) − 1)`, clamped. One definition on purpose —
  * three call sites (Bench's noise telemetry, the range-bin
  * auto-width sampler, the profileStats suite brackets) each
  * hand-rolled this and one already drifted (Bench's `(p·n).toInt`
  * indexed high on small samples: with 2 reps the reported "median"
  * was the max — fixed round 9).
  */
object Stats {
  def nearestRankIdx(n: Int, p: Double): Int = {
    require(n > 0, "nearestRank needs a non-empty sample")
    math.max(0, math.min(n - 1, math.ceil(p * n).toInt - 1))
  }

  def nearestRank(sorted: Array[Long], p: Double): Long =
    sorted(nearestRankIdx(sorted.length, p))

  def nearestRank(sorted: Array[Double], p: Double): Double =
    sorted(nearestRankIdx(sorted.length, p))

  def nearestRank(sorted: IndexedSeq[Double], p: Double): Double =
    sorted(nearestRankIdx(sorted.length, p))
}
