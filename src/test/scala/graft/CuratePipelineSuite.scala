package graft

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.api.CuratePipeline

/** The composed curation pipeline: every stage's invariant must hold
  * on the final curated set, and the whole run must be reproducible.
  */
class CuratePipelineSuite extends GraftSuite {

  private lazy val (curated, report) = CuratePipeline.curate(spark, sf0001)
  private lazy val rows = curated.collect()

  test("funnel is monotone and non-empty") {
    assert(report.input >= report.afterQuality)
    assert(report.afterQuality >= report.afterExactDedup)
    assert(report.afterExactDedup >= report.afterFuzzyDedup)
    assert(report.afterFuzzyDedup >= report.afterDecontaminate)
    assert(report.afterDecontaminate >= report.curated)
    assert(report.curated > 0, s"curated set must be non-empty: $report")
  }

  test("no exact duplicates survive") {
    val texts = rows.map(_.getAs[String]("text"))
    assert(texts.length == texts.distinct.length, "exact-dup texts remain")
  }

  test("no minhash near-dup (higher id of a pair) survives") {
    val dropped = queries.MinHashDf.qDedupMinhashDf(spark, sf0001)
      .select(col("doc_b")).collect().map(_.getLong(0)).toSet
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(ids.intersect(dropped).isEmpty)
  }

  test("no contaminated doc survives") {
    val contaminated = queries.PipelineExtras.qDecontaminate(spark, sf0001)
      .select(col("train_doc")).collect().map(_.getLong(0)).toSet
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(ids.intersect(contaminated).isEmpty)
  }

  test("every curated doc satisfies the mixture-sampling hash rule (driver-side recompute)") {
    def h4(s: String): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .take(2).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id"); val src = r.getAs[String]("source")
      assert(h4(id.toString) % 100 < 10 + h4(src) % 80,
        s"doc $id violates the sampling rule for source $src")
    }
  }

  test("the whole Report is computed in ONE action (no per-stage lineage recount)") {
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        actions.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      CuratePipeline.curate(spark, sf0001)
      // listener delivery is async: wait until the count stops moving
      var last = -1; var stable = 0; var waited = 0
      while (stable < 8 && waited < 30000) {
        Thread.sleep(250); waited += 250
        val c = actions.get()
        if (c == last) stable += 1 else { stable = 0; last = c }
      }
      assert(actions.get() == 1,
        s"curate must fold all six funnel counts into one aggregate action, saw ${actions.get()}")
    } finally spark.listenerManager.unregister(l)
  }

  test("optional repetition gate: looping docs drop in stage 1, survivors all satisfy the rule") {
    val (curated2, report2) = CuratePipeline.curate(spark, sf0001, maxRepetition = Some(0.05))
    assert(report2.afterQuality < report.afterQuality,
      s"the 0.05 cap must filter the fixture's high-repetition tail " +
        s"(${report2.afterQuality} vs ${report.afterQuality})")
    val reps = queries.PipelineExtras.repetitionStats(
      curated2.select(col("doc_id"), col("text"))).collect()
      .map(r => r.getAs[Double]("max_gram_frac"))
    assert(reps.nonEmpty && reps.forall(_ <= 0.05 + 1e-9),
      s"every curated doc must satisfy the repetition rule (max=${reps.max})")
  }

  test("DedupClusters: min-label propagation == driver-side union-find; chains collapse to one exemplar") {
    val sess = spark; import sess.implicits._
    // chain 1-5, 3-5 (the case greedy higher-id dropping gets wrong),
    // a 4-cycle, a big star, and an isolated pair
    val pairs = Seq((1L, 5L), (3L, 5L), (10L, 11L), (11L, 12L), (12L, 13L),
      (10L, 13L), (20L, 21L), (20L, 22L), (20L, 23L), (30L, 31L))
      .toDF("doc_a", "doc_b")
    val got = graft.api.DedupClusters.assign(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side union-find truth
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.collect().foreach { r =>
      val (a, b) = (find(r.getLong(0)), find(r.getLong(1)))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val want = got.keys.map(k => k -> find(k)).toMap
    assert(got == want, s"labels diverge from union-find: ${got.toSeq.sorted}")
    assert(got(3L) == 1L, "chain-middle doc must join the chain minimum's cluster")

    // curate with transitiveFuzzy: drops a superset of greedy's drop
    // set, and still satisfies every downstream invariant
    val (curatedT, reportT) = CuratePipeline.curate(spark, sf0001, transitiveFuzzy = true)
    assert(reportT.afterFuzzyDedup <= report.afterFuzzyDedup,
      "transitive clustering can only drop MORE docs than greedy")
    assert(reportT.curated > 0)
    val idsT = curatedT.collect().map(_.getAs[Long]("doc_id")).toSet
    val clusters = graft.api.DedupClusters
      .assign(queries.MinHashDf.qDedupMinhashDf(spark, sf0001)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idsT.forall(id => clusters.get(id).forall(_ == id)),
      "only cluster exemplars (minima) may survive transitive fuzzy dedup")
  }

  test("DedupClusters: a diameter-60 chain converges in O(log d) rounds (no maxIters bump)") {
    val sess = spark; import sess.implicits._
    // path 0-1-2-...-60: plain min-label propagation needs 60 rounds
    // (> the default maxIters=50); the pointer jump must collapse it
    val pairs = (0L until 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // a tight iteration budget pins the LOGARITHMIC claim, not just
    // "converges eventually": ceil(log2(60)) + slack
    val got = graft.api.DedupClusters.assign(pairs, maxIters = 12).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == (0L to 60L).toSet)
    assert(got.values.forall(_ == 0L),
      s"whole chain must label to the minimum; got ${got.toSeq.sorted.take(8)}...")
  }

  test("bit-for-bit reproducible") {
    val (again, report2) = CuratePipeline.curate(spark, sf0001)
    assert(report2 == report)
    assert(again.collect().toSeq == rows.toSeq)
  }
}
