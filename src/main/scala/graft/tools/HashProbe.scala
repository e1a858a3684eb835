package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r19 throwaway: interleaved A/B of the shipped jaccard/containment
  * pipelines vs the r18 string-keyed/no-warm shape, one JVM, so box
  * noise hits both variants equally. */
object HashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    // reps = 0 → digest-compare mode: one execution per variant,
    // order-invariant output digest printed (old-vs-new engine A/B at
    // scales where no materialized compare is practical, e.g. g10)
    val reps = args.lift(0).map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val CUT = 50; val K = 5; val CAP = 200L; val JMIN = 0.2; val CMIN = 0.8

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def collapseOld(): (DataFrame, DataFrame) = {
      val d0 = docs.filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"), col("text"))
      val withUid = d0.select(col("doc_id"), md5(col("text")).as("_tk"))
        .withColumn("uid", min(col("doc_id")).over(Window.partitionBy(col("_tk"))))
        .select(col("doc_id"), col("uid")).cache()
      val urep = d0.join(withUid.filter(col("doc_id") === col("uid"))
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
      (withUid, urep)
    }
    def samePairs(memb: DataFrame, sn: String) =
      memb.as("a").join(memb.as("b"),
          col("a.uid") === col("b.uid") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), lit(1.0).as(sn))
    def expand(cross: DataFrame, memb: DataFrame, sn: String) = {
      val ma = memb.select(col("uid").as("doc_a"), col("doc_id").as("da"))
      val mb = memb.select(col("uid").as("doc_b"), col("doc_id").as("db"))
      cross.join(ma, "doc_a").join(mb, "doc_b")
        .select(least(col("da"), col("db")).as("doc_a"),
          greatest(col("da"), col("db")).as("doc_b"), col(sn))
    }
    def shingles(d: DataFrame) = d
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")))
        .as("sh"))

    // --- r18 jaccard (string keys, no warm) ---
    def jaccardOld(): DataFrame = {
      val (memb, urep) = collapseOld()
      val sh = shingles(urep).cache()
      val shDf = sh.withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh")))).cache()
      val stats = shDf.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("sz"),
          sum(when(col("df") <= CUT, 1L).otherwise(0L)).as("rz")).cache()
      val rare = shDf.filter(col("df") <= CUT).select(col("doc_id"), col("sh"))
      val interR = rare.as("a").join(rare.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter_r"))
      val mostlyHot = stats.filter(col("rz") < K).select(col("doc_id"))
      val rarestK = shDf.join(mostlyHot, "doc_id")
        .withColumn("_r", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
        .filter(col("_r") <= K && col("df") <= CAP).select(col("doc_id"), col("sh"))
      val candRarest = rarestK.as("a").join(rarestK.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
      val cand = interR.join(candRarest, Seq("doc_a", "doc_b"), "full_outer")
        .na.fill(0L, Seq("inter_r"))
      val withStats = cand
        .join(stats.select(col("doc_id").as("doc_a"), col("sz").as("sa"), col("rz").as("ra")), "doc_a")
        .join(stats.select(col("doc_id").as("doc_b"), col("sz").as("sb"), col("rz").as("rb")), "doc_b")
      val ub = col("inter_r") + least(col("sa") - col("ra"), col("sb") - col("rb"))
      val survivors = withStats
        .filter(ub.cast("double") / (col("sa") + col("sb") - ub).cast("double") >= lit(JMIN - 1e-6))
        .select(col("doc_a"), col("doc_b"), col("sa"), col("sb")).cache()
      val survIds = survivors.select(col("doc_a").as("doc_id"))
        .unionByName(survivors.select(col("doc_b").as("doc_id"))).distinct()
      val sets = sh.join(survIds, Seq("doc_id"), "left_semi")
        .groupBy(col("doc_id")).agg(collect_set(col("sh")).as("shs")).cache()
      val exact = survivors
        .join(sets.select(col("doc_id").as("doc_a"), col("shs").as("sha")), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("shs").as("shb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("sa"), col("sb"),
          size(array_intersect(col("sha"), col("shb"))).cast("long").as("inter"))
      val cross = exact.select(col("doc_a"), col("doc_b"),
          round(col("inter").cast("double") /
            (col("sa") + col("sb") - col("inter")).cast("double"), 6).as("jaccard"))
        .filter(col("jaccard") >= JMIN)
      samePairs(memb, "jaccard").unionByName(expand(cross, memb, "jaccard"))
        .orderBy("doc_a", "doc_b")
    }

    // --- r18 containment (string keys, no warm) ---
    def containOld(): DataFrame = {
      val (memb, urep) = collapseOld()
      val sh = shingles(urep).cache()
      val shDf = sh.withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh")))).cache()
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz")).cache()
      val prefix = shDf.join(sizes, "doc_id")
        .withColumn("_r", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
        .filter(col("_r") <= floor((lit(1.0) - lit(CMIN)) * col("sz") + lit(1e-9)).cast("long") + 1L)
        .select(col("doc_id"), col("sh"))
      val probe = shDf.filter(col("df") <= CAP).select(col("doc_id"), col("sh"))
      val cand = prefix.as("a").join(probe.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id"))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b")).distinct()
      val inter = cand
        .join(sh.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      val res = inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sa")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(col("inter").cast("double") / least(col("sa"), col("sb")).cast("double"), 6)
            .as("containment"))
        .filter(col("containment") >= CMIN)
      samePairs(memb, "containment").unionByName(expand(res, memb, "containment"))
        .orderBy("doc_a", "doc_b")
    }

    case class V(name: String, mk: () => DataFrame)
    val allVariants = Seq(
      V("jac_old", () => jaccardOld()),
      V("jac_new", () => graft.SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sfDir)),
      V("con_old", () => containOld()),
      V("con_new", () => graft.SparkEntry.queries("q_dedup_containment")(spark, sfDir)))
    // optional 3rd arg: comma-separated variant-name filter
    val variants = args.lift(2) match {
      case Some(f) => val names = f.split(",").map(_.trim).toSet
        allVariants.filter(v => names(v.name))
      case None => allVariants
    }
    if (reps == 0) {
      // digest mode: SUM of per-row 60-bit md5 prefixes over the
      // canonical comma-joined row text — order-invariant, and both
      // variants render in the SAME JVM so string rendering of the
      // double score is identical by construction
      // a stage listener totals shuffle bytes written + executor task
      // time per variant (at-scale evidence the digest alone can't show)
      val shufBytes = new java.util.concurrent.atomic.AtomicLong
      val taskMs = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          if (sc.stageInfo.taskMetrics != null) {
            shufBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
            taskMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
          }
      })
      variants.foreach { v =>
        shufBytes.set(0L); taskMs.set(0L)
        val t0 = System.nanoTime()
        val df = v.mk()
        val rowStr = concat_ws(",", df.columns.sorted.map(c =>
          coalesce(col(c).cast("string"), lit(""))): _*)
        val out = df.select(rowStr.as("s"))
          .select(count(lit(1)).as("n"),
            sum(expr("CAST(conv(substring(md5(s), 1, 15), 16, 10) AS DECIMAL(38,0))")).as("d"))
          .head()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        Thread.sleep(300) // let stage-completed events drain
        println(f"[digest] ${v.name} rows=${out.getLong(0)} digest=${out.get(1)} " +
          f"wall=$wall%.1fs shuffleWriteMB=${shufBytes.get / 1e6}%.1f taskTimeSec=${taskMs.get / 1e3}%.1f")
      }
      spark.stop(); return
    }
    val acc = scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector())
    // warmup round (not recorded)
    variants.foreach { v => v.mk().count(); spark.catalog.clearCache() }
    for (r <- 1 to reps; v <- variants) {
      val t0 = System.nanoTime()
      val n = v.mk().count()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      acc(v.name) = acc(v.name) :+ t
      if (r == 1) println(s"[ab] ${v.name} rows=$n")
    }
    variants.foreach { v =>
      val ts = acc(v.name).sorted
      println(f"[ab] ${v.name}%-8s min=${ts.head}%6.3f med=${ts(ts.size / 2)}%6.3f all=${acc(v.name).map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
