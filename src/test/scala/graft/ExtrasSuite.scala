package graft

import org.apache.spark.sql.functions._
import graft.functions.FloatVecDot
import graft.queries.{Multimodal, PipelineExtras}

/** New-component guards: the native fvec_dot expression, SimHash
  * locality, and the multimodal decode plumbing.
  */
class ExtrasSuite extends GraftSuite {

  test("fvec_dot: bit-identical to the zip_with+aggregate HOF fold; codegen'd") {
    FloatVecDot.register(spark)
    val e = Tables.embeddings(spark, sf0001).limit(100)
      .select(col("vec_id"), col("embedding").as("a"))
    val e2 = Tables.embeddings(spark, sf0001).limit(50)
      .select(col("embedding").as("b"))
    val pairs = e.crossJoin(e2)
      .select(
        expr("fvec_dot(a, b)").as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0,
      "native expression must reproduce the HOF fold bit-for-bit")
    // whole-stage codegen must cover the projection containing
    // fvec_dot: the `*(n)` prefix marks codegen'd operators
    val p = e.select(expr("fvec_dot(a, a)")).queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[fvec_dot""".r.findFirstIn(p).isDefined,
      s"fvec_dot projection must be inside WholeStageCodegen:\n$p")
  }

  test("fvec_dot: null and type handling") {
    FloatVecDot.register(spark)
    val sess = spark
    import sess.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Option(Seq(3.0f, 4.0f))), (Seq(1.0f), None))
      .toDF("a", "b")
    val got = df.select(expr("fvec_dot(a, b)")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(11.0), None))
    val err = intercept[Exception] {
      Seq(1).toDF("x").select(expr("fvec_dot(x, x)")).collect()
    }
    assert(err.getMessage.contains("fvec_dot"), err.getMessage)
  }

  test("q_dedup_simhash: near-dup docs (low n-gram Jaccard distance) have closer simhashes than random pairs") {
    val sig = PipelineExtras.qDedupSimhash(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nearDups = queries.LlmPipeline.qDedupFuzzyMinhash(spark, sf0001).collect()
      .filter(_.getAs[Double]("jaccard_dist") <= 0.3)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(nearDups.nonEmpty)
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val nearMean = nearDups.map { case (a, b) => hamming(sig(a), sig(b)) }.sum.toDouble / nearDups.length
    val ids = sig.keys.toSeq.sorted.take(60)
    val randPairs = for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
    val randMean = randPairs.map { case (a, b) => hamming(sig(a), sig(b)) }.sum.toDouble / randPairs.length
    assert(nearMean < randMean - 2,
      s"simhash must be locality-sensitive: near=$nearMean rand=$randMean")
  }

  test("q_multimodal_decode: plumbing — schema, determinism, partition invariance") {
    val out = Multimodal.qMultimodalDecode(spark, sf0001)
    assert(out.schema.fieldNames.toSeq ==
      Seq("doc_id", "container", "payload_hint", "n_bytes", "byte_sum", "mean_byte"))
    val rows = out.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getAs[Int]("n_bytes") == 16), "md5 payload is 16 bytes")
    // deterministic under re-execution
    assert(Multimodal.qMultimodalDecode(spark, sf0001).collect().toSeq == rows.toSeq)
  }
}
