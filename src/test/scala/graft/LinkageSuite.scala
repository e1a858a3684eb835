package graft

import org.apache.spark.sql.functions._
import graft.queries.Linkage

/** Guards for the #128–#131 rows (queries/Linkage.scala): duplicate-
  * passage span structure, SymSpell blocking completeness vs a brute-
  * force join, delta-maintenance == latest-state recompute, and
  * excision == corpus minus exactly the detected spans.
  */
class LinkageSuite extends GraftSuite {

  test("q_dedup_substring (#128): spans are maximal, well-formed, and anchored on truly duplicated shingles") {
    val out = Linkage.qDedupSubstring(spark, sf0001).cache()
    val rows = out.collect()
    assert(rows.nonEmpty, "fixture dup structure must yield at least one duplicated passage")

    // Well-formed: every span covers >= K words and its shingle count
    // fits the span (contiguous run would give len - K + 1 shingles).
    val K = Linkage.SUB_K
    rows.foreach { r =>
      val (start, end, n) = (r.getInt(1), r.getInt(2), r.getLong(3))
      assert(end - start + 1 >= K, s"span shorter than a shingle: $r")
      assert(n >= 1 && n <= end - start + 1 - K + 1, s"shingle count outside span bounds: $r")
    }

    // Maximal: consecutive spans of one doc must be separated by a
    // real gap, else the island merge would have fused them.
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      rs.sortBy(_.getInt(1)).toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.getInt(1) > a.getInt(2) + 1,
            s"adjacent spans not merged: $a | $b")
        case _ => ()
      }
    }

    // Anchored: the opening shingle of each span really occurs in >= 2
    // documents (re-derived independently from the raw fixture).
    Tables.documents(spark, sf0001).createOrReplaceTempView("docs_chk")
    val spanHead = spark.sql(
      s"""SELECT doc_id, pos, sh FROM (
         |  SELECT doc_id, i AS pos,
         |         array_join(slice(split(text, ' '), i, $K), ' ') AS sh
         |  FROM docs_chk LATERAL VIEW explode(
         |    sequence(1, size(split(text, ' ')) - ${K - 1})) t AS i
         |  WHERE size(split(text, ' ')) >= $K)""".stripMargin)
    spanHead.createOrReplaceTempView("shingles_chk")
    val heads = rows.map(r => (r.getLong(0), r.getInt(1))).take(20)
    heads.foreach { case (doc, pos) =>
      val nDocs = spark.sql(
        s"""SELECT COUNT(DISTINCT doc_id) FROM shingles_chk
           |WHERE sh = (SELECT sh FROM shingles_chk
           |            WHERE doc_id = $doc AND pos = $pos)""".stripMargin)
        .head().getLong(0)
      assert(nDocs >= 2, s"span head at (doc=$doc, pos=$pos) occurs in only $nDocs doc(s)")
    }
    out.unpersist()
  }

  test("q_join_editdist (#129): deletion-neighborhood blocking finds EXACTLY the brute-force ed-1 pairs") {
    val blocked = Linkage.qJoinEditdist(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(blocked.nonEmpty, "sf0.001 sample must contain ed-1 name pairs")
    assert(blocked.forall(_._3 == 1), "every emitted pair must have distance exactly 1")
    assert(blocked.forall(p => p._1 < p._2), "pairs must be canonically ordered")

    // Brute force over the same deterministic 25% sample: the SymSpell
    // d=1 guarantee says the blocked plan misses nothing and the exact
    // verify admits nothing extra.
    val nm = Tables.customer(spark, sf0001)
      .filter(expr("substring(md5(CAST(CAST(c_custkey AS STRING) AS BINARY)), 1, 1) <= '3'"))
      .select(col("c_name"))
    val brute = nm.as("a").crossJoin(nm.as("b"))
      .filter(col("a.c_name") < col("b.c_name"))
      .filter(levenshtein(col("a.c_name"), col("b.c_name")) === 1)
      .select(col("a.c_name"), col("b.c_name"))
      .collect().map(r => (r.getString(0), r.getString(1), 1)).toSet
    assert(blocked == brute,
      s"blocked != brute: missing=${(brute -- blocked).take(5)} extra=${(blocked -- brute).take(5)}")
  }

  test("q_join_editdist (#129) property: blocked == brute-force levenshtein on generated unicode near-pair corpora") {
    // ScalaCheck generator over random near-pairs (VERDICT r12
    // Next-round #7): bases over a mixed latin/digit/accent/greek/CJK
    // alphabet (BMP-only, so Spark's UTF8 binary `<` and Scala's
    // UTF-16 compare agree), each mutated by substitution / insertion
    // / deletion / transposition at random positions — transpositions
    // are the ed-2 shape that broke PLAIN variant blocking on dense
    // key spaces (r12 probe) and must NOT appear in the output. The
    // ENGINE plan (Linkage.editDistJoin — the exact #129 SQL) is
    // asserted equal to a driver-side DP levenshtein brute force on
    // every sampled corpus.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val alphabet: Seq[Char] =
      ('a' to 'z') ++ ('0' to '9') ++ "äöüßéèñçαβγδ中文字と한".toSeq
    val baseGen: Gen[String] = for {
      n <- Gen.choose(1, 12)
      cs <- Gen.listOfN(n, Gen.oneOf(alphabet))
    } yield cs.mkString
    def mutantGen(s: String): Gen[String] = {
      val subst = for {
        i <- Gen.choose(0, s.length - 1); c <- Gen.oneOf(alphabet)
      } yield s.updated(i, c)
      val insert = for {
        i <- Gen.choose(0, s.length); c <- Gen.oneOf(alphabet)
      } yield s.substring(0, i) + c + s.substring(i)
      val delete =
        if (s.length <= 1) insert
        else Gen.choose(0, s.length - 1).map(i => s.substring(0, i) + s.substring(i + 1))
      val transpose =
        if (s.length < 2) subst
        else Gen.choose(0, s.length - 2).map { i =>
          s.substring(0, i) + s(i + 1) + s(i) + s.substring(i + 2)
        }
      Gen.oneOf(subst, insert, delete, transpose)
    }
    val corpusGen: Gen[List[String]] = for {
      nBase <- Gen.choose(12, 25)
      bases <- Gen.listOfN(nBase, baseGen)
      mutants <- Gen.sequence[List[String], String](
        bases.flatMap(b => List.fill(2)(mutantGen(b))))
    } yield bases ++ mutants
    def lev(a: String, b: String): Int = {
      val (x, y) = (a.toCharArray, b.toCharArray)
      val dp = Array.tabulate(y.length + 1)(identity)
      for (i <- 1 to x.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to y.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (x(i - 1) == y(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(y.length)
    }
    val sess = spark; import sess.implicits._
    for (k <- 0 until 8) {
      val corpus = corpusGen.pureApply(Gen.Parameters.default, Seed(1000L + k))
        .distinct.sorted
      val blocked = Linkage.editDistJoin(spark, corpus.toDF("nm"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val brute = (for {
        i <- corpus.indices.iterator; j <- (i + 1) until corpus.size
        if lev(corpus(i), corpus(j)) == 1
      } yield (corpus(i), corpus(j))).toSet
      assert(brute.nonEmpty, s"seed $k: generator must plant ed-1 pairs")
      assert(blocked == brute,
        s"seed $k: blocked != brute over ${corpus.size} strings; " +
          s"missing=${(brute -- blocked).take(5)} extra=${(blocked -- brute).take(5)}")
    }
  }

  test("q_cdc_agg_maintain (#130): signed-delta aggregation == recompute from latest state; cents arithmetic exact") {
    val maintained = Linkage.qCdcAggMaintain(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(maintained.nonEmpty)

    // Independent recompute: materialize latest state per key, then a
    // plain GROUP BY — the definition the delta algebra must equal.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val recompute = Tables.events(spark, sf0001)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_type"),
        round(col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"), sum("cents").as("total_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(maintained == recompute,
      s"delta-maintained view diverged from recompute: ${maintained.diff(recompute)} vs ${recompute.diff(maintained)}")

    // Every key's superseded versions cancel exactly (integer cents):
    // total user count across groups == distinct keys in the changelog.
    val users = Tables.events(spark, sf0001).select("user_id").distinct().count()
    assert(maintained.toSeq.map(_._2).sum == users,
      "net key count across groups must equal distinct changelog keys")
  }

  test("q_text_dedup_clean (#131): excision == documents minus exactly the #128 span positions") {
    val spans = graft.queries.Linkage.qDedupSubstring(spark, sf0001).collect()
      .groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(r => (r.getInt(1), r.getInt(2))) }
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = graft.queries.Linkage.qTextDedupClean(spark, sf0001).collect()
    assert(out.length == docs.size, "every document must be re-emitted")
    var removedDocs = 0
    out.foreach { r =>
      val (d, nWords, nRemoved, clean) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))
      val words = docs(d).split(" ", -1)
      assert(words.length == nWords, s"doc $d word count")
      val cover = spans.getOrElse(d, Array.empty[(Int, Int)])
      val expected = words.zipWithIndex.collect {
        case (w, i) if !cover.exists { case (s, e) => i + 1 >= s && i + 1 <= e } => w
      }
      assert(clean == expected.mkString(" "),
        s"doc $d: cleaned text must drop exactly the span positions")
      assert(nRemoved == nWords - expected.length, s"doc $d removal accounting")
      if (nRemoved > 0) removedDocs += 1
    }
    assert(removedDocs > 0, "fixture dup structure must drive at least one excision")
  }
}
