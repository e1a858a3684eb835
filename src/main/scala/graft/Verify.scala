package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // fixture-scale split sizing — same rationale as Bench: the
      // sharded GenScale corpora must scan in parallel, not as 1 task
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "131072")
      // AQE for cached plans — same conf as Bench (r18 opt round):
      // identical results, collapses near-empty cached partitions
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // uniform timestamp flavor for the WHOLE session: the events
    // read confs are sticky, so without this the flavor of orders/
    // lineitem timestamp columns would depend on whether an
    // events-touching query happened to run first (map order)
    Tables.setEventsReadConfs(spark)
    new java.io.File(outDir).mkdirs()
    // optional comma-separated filter for targeted local pre-checks
    // (same contract as Bench); the driver sets nothing → full dump
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    // Queries listed here write WITHOUT coalesce(1) (r15): for the
    // corpus-dump rows at the 100x scale, coalesce(1) executes the
    // terminal global sort + write of tens of millions of rows in ONE
    // task (observed: 40+ min single-threaded for a 42M-row output
    // while 31 cores idle). Those rows are compared order-invariantly
    // (DuckDB EXCEPT ALL multiset diff), so multi-file output is fine;
    // the default stays coalesce(1) because the positional driver
    // compare wants one file. Local pre-check sweeps only — the
    // driver sets nothing.
    val uncoalesced = sys.env.get("SPARK_GRAFT_UNCOALESCED")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // written BEFORE the query loop (r15): it depends only on the
    // static oracleSql map, and the sweep scripts' overlapped oracle
    // loop gates each row on its presence — writing it last would
    // serialize the two phases for no reason.
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        (if (uncoalesced(name)) df else df.coalesce(1))
          .write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
