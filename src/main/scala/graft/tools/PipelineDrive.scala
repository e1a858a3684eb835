package graft.tools

import org.apache.spark.sql.SparkSession
import graft.api.CuratePipeline

/** Demo: the end-to-end training-data curation funnel —
  * `sbt "runMain graft.tools.PipelineDrive [sfDir] [outDir]"`.
  */
object PipelineDrive {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.drop(1).headOption
      .getOrElse(java.nio.file.Files.createTempDirectory("curated").toString + "/docs")
    val spark = SparkSession.builder().master("local[4]")
      .appName("pipeline-drive")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the full round-6 gate set: repetition rule in stage 1 and
    // transitive (connected-component) fuzzy dedup
    val (curated, r) = CuratePipeline.curate(spark, dir,
      maxRepetition = Some(0.5), transitiveFuzzy = true)
    println(s"[pipeline-drive] input                ${r.input}")
    println(s"[pipeline-drive] after quality gate   ${r.afterQuality}")
    println(s"[pipeline-drive] after exact dedup    ${r.afterExactDedup}")
    println(s"[pipeline-drive] after fuzzy dedup    ${r.afterFuzzyDedup} (transitive clusters)")
    println(s"[pipeline-drive] after decontaminate  ${r.afterDecontaminate}")
    println(s"[pipeline-drive] curated (sampled)    ${r.curated}")
    // z-ordered layout on the curation dimensions: downstream scans
    // with (lang AND/OR source) predicates skip most row groups
    graft.api.ZOrder.clusterBy(curated, Seq("lang", "source"), numFiles = 8)
      .write.mode("overwrite").parquet(out)
    println(s"[pipeline-drive] wrote $out (z-ordered on lang, source)")
    spark.stop()
  }
}
