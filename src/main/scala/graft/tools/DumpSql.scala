package graft.tools

/** Print one oracle SQL to stdout so shell-side oracle/digest runs
  * can consume variants that are not part of the Verify dump (r16;
  * first user is the capped-minhash oracle twin, VERDICT r15 #7).
  *
  * Usage: `DumpSql <queryName>`            — SparkEntry.oracleSql entry
  *        `DumpSql minhash_capped <cap>`   — #71's capped twin
  */
object DumpSql {
  def main(args: Array[String]): Unit = args.toList match {
    case "minhash_capped" :: cap :: Nil =>
      println(graft.queries.MinHashDf.qDedupMinhashDfCappedSql(cap.toLong))
    case name :: Nil =>
      println(graft.SparkEntry.oracleSql(name))
    case _ => sys.error("usage: DumpSql <queryName> | DumpSql minhash_capped <cap>")
  }
}
