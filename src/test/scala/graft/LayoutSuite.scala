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
