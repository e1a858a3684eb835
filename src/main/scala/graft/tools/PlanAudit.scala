package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** One-off plan/metrics audit (r15, built while chasing the sf100
  * disk-footprint failures of the minhash family): runs a query at a
  * scale dir, then walks the EXECUTED plan and prints every node's
  * interesting runtime metrics (shuffle bytes written, spill sizes,
  * rows) — the data the WARN-level logs and the disabled UI don't
  * show, so transient-disk blowups can be attributed to a specific
  * exchange instead of guessed at.
  *
  * Caveats: metrics cover the FINAL executed plan (plus cached
  * relations and AQE stages it references). Queries that run eager
  * work at CONSTRUCTION time — the iterative pointer-jump loops
  * localCheckpoint their rounds before the terminal count — show only
  * the terminal stage here; their loop volume is measured by the
  * dedicated scale probes instead. The trailing JSON line sums
  * shuffle bytes/records and spill over DISTINCT plan nodes.
  *
  * Usage: `PlanAudit <sfDir> <queryName>`
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.setEventsReadConfs(spark)
    // JVM-total counters via a stage listener (r16): queries that do
    // eager work at construction (checkpointed fixpoint loops) leave
    // nothing in the terminal plan — the listener sees EVERY stage of
    // every job in this JVM, so jvm_total_* is the true end-to-end
    // shuffle/spill footprint of the query.
    val jvmShuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val jvmShuffleRecs = new java.util.concurrent.atomic.AtomicLong
    val jvmSpill = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          jvmShuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          jvmShuffleRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          jvmSpill.addAndGet(m.diskBytesSpilled)
        }
      }
    })
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"== $name rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    val interesting = Set("shuffle bytes written", "spill size",
      "shuffle records written", "number of output rows", "data size")
    // visited-set (r16): AQE wrappers make the same physical node
    // reachable via both `children` and `executedPlan`/`plan`, which
    // double-printed (and would double-SUM) exchanges
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    var totShuffleBytes = 0L
    var totShuffleRecs = 0L
    var totSpill = 0L
    def walk(p: SparkPlan, depth: Int): Unit = {
      if (!seen.add(p)) return
      p.metrics.foreach { case (_, m) =>
        m.name.map(_.toLowerCase) match {
          case Some("shuffle bytes written") => totShuffleBytes += m.value
          case Some("shuffle records written") => totShuffleRecs += m.value
          case Some("spill size") if m.value > 0 => totSpill += m.value
          case _ => ()
        }
      }
      val ms = p.metrics.filter { case (_, m) =>
        m.name.exists(n => interesting(n.toLowerCase)) && m.value > 0 }
      if (ms.nonEmpty) {
        val s = ms.map { case (_, m) =>
          val v = if (m.metricType == "size") f"${m.value / 1e9}%.2f GB"
                  else f"${m.value}%,d"
          s"${m.name.getOrElse("?")}=$v"
        }.mkString(", ")
        println(s"${"  " * depth}${p.nodeName}: $s")
      }
      p.children.foreach(walk(_, depth + 1))
      p.subqueries.foreach(walk(_, depth + 1))
      // AQE wraps finished stages; unwrap to reach their metrics
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, depth + 1)
        case r: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          walk(r.relation.cachedPlan, depth + 1)
        case _ => ()
      }
    }
    walk(df.queryExecution.executedPlan, 0)
    Thread.sleep(500) // let straggler stage-completed events post
    println(f"""{"audit":"$name","sf":"$sfDir","rows":$n,"wall_sec":${(System.nanoTime() - t0) / 1e9}%.1f,"plan_shuffle_bytes":$totShuffleBytes,"plan_shuffle_records":$totShuffleRecs,"plan_spill_bytes":$totSpill,"jvm_total_shuffle_bytes":${jvmShuffleBytes.get},"jvm_total_shuffle_records":${jvmShuffleRecs.get},"jvm_total_spill_bytes":${jvmSpill.get}}""")
    spark.stop()
  }
}
