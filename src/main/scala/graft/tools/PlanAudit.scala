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
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"== $name rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    val interesting = Set("shuffle bytes written", "spill size",
      "shuffle records written", "number of output rows", "data size")
    def walk(p: SparkPlan, depth: Int): Unit = {
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
    spark.stop()
  }
}
