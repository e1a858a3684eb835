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
    val (curated, r) = CuratePipeline.curate(spark, dir)
    println(s"[pipeline-drive] input                ${r.input}")
    println(s"[pipeline-drive] after quality gate   ${r.afterQuality}")
    println(s"[pipeline-drive] after exact dedup    ${r.afterExactDedup}")
    println(s"[pipeline-drive] after fuzzy dedup    ${r.afterFuzzyDedup}")
    println(s"[pipeline-drive] after decontaminate  ${r.afterDecontaminate}")
    println(s"[pipeline-drive] curated (sampled)    ${r.curated}")
    curated.write.mode("overwrite").parquet(out)
    println(s"[pipeline-drive] wrote $out")
    spark.stop()
  }
}
