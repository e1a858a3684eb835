package graft

import org.apache.spark.sql.functions._
import graft.api.PqIndex
import graft.queries.LlmPipeline

/** Product-quantization ANN: build → ADC shortlist → exact re-rank.
  * The recall bar is the 100 TB claim: byte-packed codes (m bytes —
  * 32× smaller than the 64-dim float vectors) must still shortlist
  * the true neighbors for the exact re-rank to recover.
  */
class PqIndexSuite extends GraftSuite {

  private lazy val indexDir = {
    val dir = java.nio.file.Files.createTempDirectory("pq_idx").toString
    PqIndex.build(spark, Tables.embeddings(spark, sf0001), dir, m = 8, k = 16)
    dir
  }

  private def recallAt5(got: Array[org.apache.spark.sql.Row]): Double = {
    val exact = LlmPipeline.qSimCosineTopk(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ann = got.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, want) =>
      ann.get(q).map(g => g.intersect(want).size.toDouble / want.size).getOrElse(0.0)
    }
    recalls.sum / recalls.size
  }

  test("codes are m BYTES per vector — the 32x storage story, at k=16 and k=256 alike") {
    val codes = spark.read.parquet(s"$indexDir/v1/codes")
    assert(codes.count() == Tables.embeddings(spark, sf0001).count())
    assert(codes.schema("codes").dataType ==
      org.apache.spark.sql.types.BinaryType, "codes column must be binary")
    val r = codes.select(octet_length(col("codes")).as("m")).agg(max("m"), min("m")).head()
    assert(r.getInt(0) == 8 && r.getInt(1) == 8, "exactly m=8 bytes per vector")
    val allCodes = codes.collect().flatMap(_.getAs[Array[Byte]]("codes")).map(_ & 0xFF)
    assert(allCodes.forall(c => c >= 0 && c < 16), "k=16 codes use only ids 0..15")
    val books = spark.read.parquet(s"$indexDir/v1/codebooks")
    assert(books.count() == 8 * 16, "m x k codebook entries")
    assert(new java.io.File(s"$indexDir/v1/_graft_committed").exists,
      "codebooks+codes publish as one committed version")
  }

  test("k=256: the full unsigned-byte code range is live and recall does not regress") {
    val dir = java.nio.file.Files.createTempDirectory("pq_idx256").toString
    PqIndex.build(spark, Tables.embeddings(spark, sf0001), dir, m = 8, k = 256)
    val codes = spark.read.parquet(s"$dir/v1/codes")
    val widths = codes.select(octet_length(col("codes")).as("m"))
      .agg(max("m"), min("m")).head()
    assert(widths.getInt(0) == 8 && widths.getInt(1) == 8,
      "k=256 codes are STILL m=8 bytes (that is the point of byte packing)")
    // codes above 127 exercise the unsigned mask in pq_adc; codes
    // above 15 prove the larger codebook actually trained
    val allCodes = codes.collect().flatMap(_.getAs[Array[Byte]]("codes")).map(_ & 0xFF)
    assert(allCodes.exists(_ > 127), "expected codes in the signed-negative byte range")
    val queries = Tables.embeddings(spark, sf0001).filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding"))
    val r256 = recallAt5(PqIndex.query(spark, queries,
      Tables.embeddings(spark, sf0001), dir, topK = 5, shortlist = 50).collect())
    val r16 = recallAt5(PqIndex.query(spark, queries,
      Tables.embeddings(spark, sf0001), indexDir, topK = 5, shortlist = 50).collect())
    assert(r256 >= r16 - 0.02,
      f"k=256 recall $r256%.2f must not regress vs k=16's $r16%.2f")
    assert(r256 >= 0.5, f"k=256 recall@5 $r256%.2f below floor")
  }

  test("ADC shortlist + exact re-rank: recall@5 well above random") {
    val queries = Tables.embeddings(spark, sf0001).filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding"))
    val mean = recallAt5(PqIndex.query(spark, queries,
      Tables.embeddings(spark, sf0001), indexDir, topK = 5, shortlist = 50).collect())
    // random 50-of-499 shortlist would give ~0.10 recall@5; the ADC
    // shortlist must concentrate true neighbors
    assert(mean >= 0.5, f"PQ mean recall@5 $mean%.2f (random-shortlist baseline ~0.10)")
  }

  test("IVF-PQ composition: ADC scan restricted to probed IVF cells still recalls") {
    // the canonical billion-vector layout: IVF picks the lists, PQ
    // keeps them small, exact re-rank touches only the shortlist
    val ivfDir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    graft.api.IvfIndex.build(spark, Tables.embeddings(spark, sf0001), ivfDir, k = 16)
    val cells = spark.read.parquet(s"$ivfDir/corpus").select("vec_id", "cell")
    val queries = Tables.embeddings(spark, sf0001).filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding"))
    // probed members = union of each query's nProbe cells (the suite
    // shortcut: one shared restriction set; per-query restriction is
    // what IvfIndex.query's cell join does natively)
    val probedCells = graft.api.IvfIndex
      .query(spark, queries, ivfDir, nProbe = 6, topK = 500)
      .select(col("nid").as("vec_id")).distinct()
      .join(cells, "vec_id").select("cell").distinct()
    val members = cells.join(probedCells, "cell").select("vec_id")
    val restricted = members.count()
    assert(restricted < 500, s"probed cells must be a strict corpus subset ($restricted)")
    val exact = LlmPipeline.qSimCosineTopk(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = PqIndex.query(spark, queries, Tables.embeddings(spark, sf0001),
        indexDir, topK = 5, shortlist = 50, restrictTo = Some(members)).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, want) =>
      got.get(q).map(g => g.intersect(want).size.toDouble / want.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, f"IVF-restricted PQ recall@5 $mean%.2f over $restricted vectors")
  }

  test("exact re-rank scores are true cosines (bit-equal to fvec_dot on the originals)") {
    val queries = Tables.embeddings(spark, sf0001).filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding"))
    val out = PqIndex.query(spark, queries, Tables.embeddings(spark, sf0001),
      indexDir, topK = 3, shortlist = 20).collect()
    val emb = Tables.embeddings(spark, sf0001).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding")).toMap
    out.foreach { r =>
      val (q, n) = (emb(r.getAs[Long]("qid")), emb(r.getAs[Long]("nid")))
      val dot = q.zip(n).map { case (a, b) => a.toDouble * b.toDouble }.sum
      assert(math.abs(r.getAs[Double]("cos_sim") - BigDecimal(dot)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }
}
