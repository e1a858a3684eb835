package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the classic lakehouse layout
  * tool for MULTI-dimensional data skipping (SURVEY.md §4.3). A
  * single-column sort gives min/max-stats skipping on its lead column
  * and nothing on the others; interleaving the bits of several
  * dimension codes and range-partitioning on the combined z-value
  * gives every file a compact rectangle of the dimension space, so a
  * conjunction of dimension predicates overlaps roughly the PRODUCT
  * of the per-dimension fractions of files — and even a predicate on
  * a non-lead dimension alone still skips.
  *
  * Scale shape: the per-dimension code tables are planning-scale by
  * the definition of a clustering dimension (low cardinality — else
  * range-cluster on the raw value instead); the z-value itself is a
  * pure codegen'd bit expression per row, and the layout write is one
  * `repartitionByRange` shuffle — exactly what a periodic OPTIMIZE
  * ZORDER BY compaction job does on a lakehouse table.
  */
object ZOrder {

  /** Interleave the low `bits` bits of the given integer dimension
    * codes: bit i of dimension j lands at position i*ndims + j.
    */
  def zValue(dims: Seq[Column], bits: Int = 8): Column = {
    require(dims.nonEmpty && bits > 0 && bits * dims.length <= 63,
      s"need 0 < bits*ndims <= 63 (got $bits x ${dims.length})")
    (for {
      (d, j) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(d.cast("long"), i).bitwiseAND(lit(1L)),
        i * dims.length + j))
      .reduce(_.bitwiseOR(_))
  }

  /** Dense integer code for a (categorical) dimension column: the
    * rank of the value among the column's distinct values. The
    * distinct set is collected driver-side — planning-scale, same
    * class as NTILE cut points — and compiled into a codegen'd CASE
    * chain (values absent at code-build time fall back to 0, which
    * only weakens skipping, never correctness: skipping is done by
    * parquet min/max stats on the ORIGINAL columns).
    */
  def dimCode(df: DataFrame, dim: String, bits: Int = 8): Column = {
    // limit BEFORE collect: the cardinality guard must fire as an
    // error message, not as a driver OOM on a misapplied
    // high-cardinality column
    val vals = df.select(col(dim)).distinct().orderBy(col(dim))
      .limit((1 << bits) + 1)
      .collect().map(_.get(0)).filter(_ != null)
    require(vals.length <= (1 << bits),
      s"dimension $dim has > 2^$bits distinct values; " +
        "raise bits or range-cluster on the raw value instead")
    if (vals.isEmpty) lit(0L)
    else vals.zipWithIndex.drop(1)
      .foldLeft(when(col(dim) === lit(vals(0)), 0L)) {
        case (acc, (v, i)) => acc.when(col(dim) === lit(v), i.toLong)
      }.otherwise(lit(0L))
  }

  /** Integer code for a NUMERIC (high-cardinality) dimension: linear
    * min/max scaling into [0, 2^bits) buckets. One tiny driver-side
    * two-value aggregate (planning-scale, the same class as stats
    * collection in any OPTIMIZE job). Nulls code to 0 — again only a
    * skipping, never a correctness, concern.
    */
  def dimCodeRange(df: DataFrame, dim: String, bits: Int = 8): Column = {
    val r = df.agg(min(col(dim)).cast("double"), max(col(dim)).cast("double")).head()
    if (r.isNullAt(0) || r.isNullAt(1) || r.getDouble(1) <= r.getDouble(0)) lit(0L)
    else {
      val (lo, hi) = (r.getDouble(0), r.getDouble(1))
      val cells = (1L << bits) - 1L
      least(lit(cells), greatest(lit(0L),
        floor((coalesce(col(dim).cast("double"), lit(lo)) - lit(lo)) /
          lit(hi - lo) * cells))).cast("long")
    }
  }

  /** Rewrite `df` as `numFiles` z-ordered output partitions on the
    * given dimension columns — numeric dimensions get range codes,
    * everything else dense categorical codes. Write the result with a
    * plain `.write.parquet(...)`: each task's file then carries tight
    * min/max footer stats on every dimension.
    */
  /** Per-dimension integer codes, numeric dims by range scaling and
    * everything else by dense categorical rank — the shared front end
    * of [[clusterBy]] and [[StreamzOps.compactTable]]'s z-ordered
    * OPTIMIZE.
    */
  def codesFor(df: DataFrame, dims: Seq[String], bits: Int = 8): Seq[Column] = {
    import org.apache.spark.sql.types.NumericType
    dims.map { d =>
      df.schema(d).dataType match {
        case _: NumericType => dimCodeRange(df, d, bits)
        case _ => dimCode(df, d, bits)
      }
    }
  }

  def clusterBy(df: DataFrame, dims: Seq[String], numFiles: Int,
      bits: Int = 8): DataFrame = {
    require(dims.nonEmpty && numFiles > 0)
    df.withColumn("_z", zValue(codesFor(df, dims, bits), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
