package graft

import org.apache.spark.sql.functions._

/** Storage-layout proofs for the §4.3 100 TB design claims: bucketed
  * co-located joins eliminate the join shuffle; date-partitioned
  * layout enables dynamic partition pruning (DPP).
  */
class LayoutSuite extends GraftSuite {

  test("bucketed tables: equi-join on the bucket key plans with NO shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_tbl").toString
    // force a non-broadcast join so the shuffle (or its absence) is visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf0001)
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      Tables.lineitem(spark, sf0001)
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the join inputs read pre-bucketed data: no Exchange between
      // the scans and the join (the only exchange allowed is the
      // aggregation's, above the join)
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle its inputs:\n$plan")
      // correctness unchanged
      val expect = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("runtime Bloom-filter join: selective build side injects a bloom filter into the probe scan") {
    val restore = Map(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "10GB",
      "spark.sql.autoBroadcastJoinThreshold" -> "10485760")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // thresholds scaled down to fixture sizes (defaults target real clusters)
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, sf0001)
      val o = Tables.orders(spark, sf0001).filter(col("o_orderstatus") === "P")
      val q = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
      assert(q.queryExecution.optimizedPlan.toString.contains("bloom"),
        "selective join must inject a runtime bloom filter on the probe side")
    } finally restore.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("z-order layout: multi-dim predicates skip more row groups than a single-column sort") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // the lang-sorted layout's per-file source ranges saturate at
    // this row count — the realistic shape (margins verified: 3 vs 6
    // row groups on the 2-predicate scan, 4 vs 32 on source-only)
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val nf = 32
    graft.api.ZOrder.clusterBy(docs, Seq("lang", "source"), nf)
      .write.parquet(s"$dir/z")
    // the single-column alternative: linear sort by the lead dimension
    // (doc_id breaks ties so all nf files materialize)
    docs.repartitionByRange(nf, col("lang"), col("doc_id"))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .write.parquet(s"$dir/linear")

    /** (overlapping, total) row groups whose footer min/max stats
      * admit ALL the given equality predicates — what any stats-based
      * reader (parquet pushdown, a lakehouse file index) must read. */
    def overlaps(path: String, preds: Map[String, String]): (Int, Int) = {
      val conf = spark.sessionState.newHadoopConf()
      val files = new java.io.File(path).listFiles
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
      var total = 0; var hit = 0
      files.foreach { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f), conf))
        try r.getRowGroups.asScala.foreach { rg =>
          total += 1
          val ok = preds.forall { case (c, v) =>
            val cc = rg.getColumns.asScala.find(_.getPath.toDotString == c).get
            val st = cc.getStatistics
            val mn = st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
            val mx = st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
            mn <= v && v <= mx
          }
          if (ok) hit += 1
        } finally r.close()
      }
      (hit, total)
    }

    val both = Map("lang" -> "es", "source" -> "src5")
    val (zBoth, zTotal) = overlaps(s"$dir/z", both)
    val (linBoth, linTotal) = overlaps(s"$dir/linear", both)
    assert(zTotal >= nf && linTotal >= nf, s"both layouts must span >= $nf row groups ($zTotal, $linTotal)")
    assert(zBoth < linBoth,
      s"2-predicate scan: z-order must overlap fewer row groups ($zBoth) than linear sort ($linBoth)")

    // non-lead dimension alone: linear-by-lang can skip (almost)
    // nothing; z-order still prunes
    val srcOnly = Map("source" -> "src5")
    val (zSrc, _) = overlaps(s"$dir/z", srcOnly)
    val (linSrc, _) = overlaps(s"$dir/linear", srcOnly)
    assert(zSrc < linSrc,
      s"non-lead predicate: z-order must still skip ($zSrc) where linear cannot ($linSrc)")

    // correctness: layout changes bytes on disk, never query results
    val want = docs.filter(col("lang") === "es" && col("source") === "src5")
      .collect().map(_.getLong(0)).sorted.toSeq
    val got = spark.read.parquet(s"$dir/z")
      .filter(col("lang") === "es" && col("source") === "src5")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want, "z-ordered table must return identical rows")
  }

  test("z-order with a numeric dimension: range predicate on the non-lead column skips row groups") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_num").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val nf = 32
    graft.api.ZOrder.clusterBy(docs, Seq("lang", "n_chars"), nf)
      .write.parquet(s"$dir/z")
    docs.repartitionByRange(nf, col("lang"), col("doc_id"))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .write.parquet(s"$dir/linear")

    /** (overlapping, total) row groups whose int64 n_chars stats admit
      * the range [lo, hi]. */
    def overlaps(path: String, lo: Long, hi: Long): (Int, Int) = {
      val conf = spark.sessionState.newHadoopConf()
      val files = new java.io.File(path).listFiles
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
      var total = 0; var hit = 0
      files.foreach { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f), conf))
        try r.getRowGroups.asScala.foreach { rg =>
          total += 1
          val cc = rg.getColumns.asScala.find(_.getPath.toDotString == "n_chars").get
          val st = cc.getStatistics
          val mn = st.genericGetMin.asInstanceOf[java.lang.Long].longValue
          val mx = st.genericGetMax.asInstanceOf[java.lang.Long].longValue
          if (mn <= hi && lo <= mx) hit += 1
        } finally r.close()
      }
      (hit, total)
    }

    // a narrow n_chars band — under lang-sorted linear order every
    // file spans (nearly) the whole n_chars range
    val (loB, hiB) = (100L, 150L)
    val (zHit, zTot) = overlaps(s"$dir/z", loB, hiB)
    val (linHit, linTot) = overlaps(s"$dir/linear", loB, hiB)
    assert(zTot >= nf && linTot >= nf)
    assert(zHit < linHit,
      s"numeric range on the non-lead dim: z-order $zHit vs linear $linHit of $linTot")
    // correctness unchanged
    val want = docs.filter(col("n_chars").between(loB, hiB)).count()
    val got = spark.read.parquet(s"$dir/z")
      .filter(col("n_chars").between(loB, hiB)).count()
    assert(got == want)
  }

  test("date-partitioned layout: dim filter triggers dynamic partition pruning on the fact scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.orders(spark, sf0001)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(s"$dir/orders_p")
    val fact = spark.read.parquet(s"$dir/orders_p")
    val years = fact.select(col("o_year")).distinct().collect().map(_.getInt(0)).sorted
    assert(years.length > 1, s"need multiple partitions for pruning, got ${years.toSeq}")
    val sess = spark
    import sess.implicits._
    // dim with a selective filter on an attribute (not the join key).
    // Must be FILE-backed: a LocalRelation dim gets its filter
    // constant-folded away (ConvertToLocalRelation), leaving no
    // "selective predicate" for the DPP rule to detect.
    years.map(y => (y, if (y == years.head) "keep" else "drop"))
      .toSeq.toDF("d_year", "flag")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val q = fact.join(dim, col("o_year") === col("d_year"))
      .filter(col("flag") === "keep")
      .agg(sum(col("o_totalprice")).as("n"), count(lit(1)).as("c"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan must carry a dynamicpruning partition filter:\n$plan")
    // and the result equals the statically-pruned count
    val want = fact.filter(col("o_year") === years.head).count()
    assert(q.collect()(0).getLong(1) == want)
  }
}
