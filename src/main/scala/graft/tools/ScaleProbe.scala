package graft.tools

import org.apache.spark.sql.SparkSession
import graft.api.EmbedBlocking

/** Scaling diagnostics for the embedding-dedup blocking table
  * (BASELINE.md round-12 scaling curve): times
  * `EmbedBlocking.dedupPairs` under the frozen oracle-compat 8-bit
  * table vs the corpus-[[EmbedBlocking.scaledTable]] at a given data
  * dir, with candidate counts — the measurement behind the
  * "raise bits with corpus size" contract.
  *
  * Usage: `runMain graft.tools.ScaleProbe [dir] [tau]`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf1")
    val tau = args.lift(1).map(_.toDouble).getOrElse(0.4)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m") // fixture-scale splits (see Bench)
      .config("spark.sql.files.openCostInBytes", "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val tables = Seq(
      "frozen8" -> EmbedBlocking.BAND_DIMS,
      s"scaled${EmbedBlocking.scaledTable(n).head.length}" ->
        EmbedBlocking.scaledTable(n))
    tables.foreach { case (name, table) =>
      val cands = EmbedBlocking.candidatePairs(e, "vec_id", "embedding", table).count()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        EmbedBlocking.dedupPairs(spark, e, "vec_id", "embedding", tau, table).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      val matches = EmbedBlocking
        .dedupPairs(spark, e, "vec_id", "embedding", tau, table).count()
      println(f"""{"probe":"$name","n":$n,"bits":${table.head.length},"candidates":$cands,"matches":$matches,"sec_min3":${times.min}%.3f}""")
    }
    spark.stop()
  }
}
