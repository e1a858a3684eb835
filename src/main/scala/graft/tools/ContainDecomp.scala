package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.PipelineExtras

/** Stage decomposition of q_dedup_containment at a given corpus
  * (VERDICT r17 Next-round #3): the r17 grow-corpus legs measured
  * ~13×/decade for the row as a whole under concurrent load; this
  * names WHICH stage carries the super-linear term by counting and
  * timing the query's own intermediate stages (exposed by
  * PipelineExtras.containmentStagesUnique — one copy of the pipeline,
  * so the probe can never drift from the query).
  *
  * Stages: sh (per-doc distinct 3-gram shingles) → prefix (the
  * ⌊(1−τ)·sz⌋+1 rarest shingles per doc) → probe (df-capped postings)
  * → cand (prefix ⨝ probe, distinct pairs) → inter (per-pair exact
  * shingle recount) → result. Alongside the counts it computes the
  * two model terms: pre-distinct candidate volume
  * Σ_sh prefixCnt(sh)·probeCnt(sh) (the join's physical output before
  * distinct — the suspected super-linear term) and the recount join
  * volume Σ_cand (sz_a + sz_b).
  *
  * Stage walls are count() walls in dependency order; sh and sizes
  * are cached by the pipeline itself, later stages recompute their
  * uncached upstream (df window) — so walls are indicative, the
  * CARDINALITIES are the scaling evidence.
  *
  * Usage: `runMain graft.tools.ContainDecomp [dataDir]`
  */
object ContainDecomp {
  def main(args: Array[String]): Unit = {
    val dataDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dataDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val (memb, urep) = PipelineExtras.collapseExact(docs)
    val nUnique = urep.count()
    val st = PipelineExtras.containmentStagesUnique(urep)
    def timedCount(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val c = df.count()
      (c, (System.nanoTime() - t0) / 1e9)
    }
    val (shN, shSec) = timedCount(st.sh)
    val distinctSh = st.sh.select(col("sh")).distinct().count()
    val (prefN, prefSec) = timedCount(st.prefix)
    val (probeN, probeSec) = timedCount(st.probe)
    // pre-distinct candidate volume: what the prefix⨝probe join
    // physically emits before the distinct collapses it
    // r19: the stage frames carry the 60-bit shingle key, not the string
    val preVol = st.prefix.groupBy(col("shh")).agg(count(lit(1)).as("pc"))
      .join(st.probe.groupBy(col("shh")).agg(count(lit(1)).as("bc")), "shh")
      .select(sum(col("pc") * col("bc"))).head().getLong(0)
    val (candN, candSec) = timedCount(st.cand)
    // recount join volume: Σ over candidate pairs of both docs' sizes
    val sizes = st.sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val rvRow = st.cand
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sa")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sb")), "doc_b")
      .select(sum(col("sa") + col("sb"))).head()
    val recountVol = if (rvRow.isNullAt(0)) 0L else rvRow.getLong(0)
    val (interN, interSec) = timedCount(st.inter)
    val (resN, resSec) = timedCount(st.result)
    println(f"""{"probe":"contain_decomp","data":"$dataDir","n_unique_docs":$nUnique,"shingles":$shN,"distinct_shingles":$distinctSh,"prefix_rows":$prefN,"probe_rows":$probeN,"cand_pre_distinct":$preVol,"cand_pairs":$candN,"recount_volume":$recountVol,"inter_pairs":$interN,"result_pairs":$resN,"wall_sec":{"sh":$shSec%.2f,"prefix":$prefSec%.2f,"probe":$probeSec%.2f,"cand":$candSec%.2f,"inter":$interSec%.2f,"result":$resSec%.2f}}""")
    spark.stop()
  }
}
