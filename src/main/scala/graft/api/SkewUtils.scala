package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY.md §4.3). AQE's OptimizeSkewedJoin
  * handles sort-merge skew automatically at runtime; explicit salting
  * is still needed when one join key dominates so heavily that a
  * single task would own it (e.g. a null-like default key, a
  * celebrity user) AND the other side is too big to broadcast.
  */
object SkewUtils {

  /** Salted equi-join: the big (skewed) side scatters each row into
    * one of `nSalts` sub-keys via a deterministic hash of
    * `saltSource` (any well-distributed column, e.g. a row id); the
    * small side is replicated `nSalts`× . Result rows are identical
    * to `big.join(small, bigKey === smallKey, "inner")` — but the
    * heaviest key's work is spread over `nSalts` tasks instead of 1.
    *
    * Cost model: replication multiplies the small side by `nSalts`,
    * so pick nSalts ≈ (heaviest-key rows / target rows per task) and
    * keep the replicated side comfortably shuffle-sized.
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: Column, smallKey: Column, saltSource: Column,
      nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val saltedBig = big.withColumn("_salt", pmod(hash(saltSource), lit(nSalts)))
    val saltedSmall = small.withColumn("_salt",
      explode(expr(s"sequence(0, ${nSalts - 1})")))
    saltedBig.join(saltedSmall,
        bigKey === smallKey && saltedBig("_salt") === saltedSmall("_salt"),
        "inner")
      .drop("_salt")
  }
}
