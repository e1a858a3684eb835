package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Order-invariant cross-engine digest for outputs too large to
  * materialize and EXCEPT-ALL diff (r15; first user is
  * q_join_interval_overlap at sf10, whose output is 4.15 BILLION
  * rows — the sweep's multiset compare tops out around tens of
  * millions). Instead of writing the rows, BOTH engines compute the
  * same two aggregates over the live result:
  *
  *   rows   = COUNT(*)
  *   digest = SUM( hex_to_int( substr( md5( concat_ws(',', cols in
  *            sorted-name order cast to string) ), 1, 15 ) ) )
  *
  * — a sum of per-row 60-bit md5 prefixes as an exact DECIMAL(38,0).
  * md5 on the canonical comma-joined string is engine-portable
  * (DuckDB: `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)`,
  * scripts/digest_check.py), addition is commutative so row order
  * is irrelevant, and equal multisets give equal digests while a
  * differing multiset collides with probability ~n²/2⁶⁰ (≈ 10⁻⁵ for
  * 4 B rows). Column-name sort mirrors the driver's hash-compare
  * convention. NULL columns carry an explicit 0x01-byte sentinel (r16,
  * ADVICE r15 #4 — concat_ws drops NULL args in both engines, so a
  * NULL and an empty string would otherwise canonicalize the same
  * row text), and an EMPTY result digests as "0" on both sides (SUM
  * over zero rows is NULL; the Python side's None stringifies
  * differently — coalesced on both).
  *
  * Usage: `QueryDigest <sfDir> <queryName>` → one JSON line
  * `{"query":…,"rows":N,"digest":"D"}` on stdout.
  */
object QueryDigest {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.setEventsReadConfs(spark)
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val cols = df.columns.sorted
    val dtypes = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    // Canonical per-column rendering (must be byte-identical to
    // digest_check.py's):
    //  - DOUBLE/FLOAT (r16): the engines' native double-to-string
    //    rules differ (Spark: Java scientific notation at 1e7+;
    //    DuckDB: shortest plain), and printf-style rounding differs
    //    on exact ties (Java HALF_UP vs C round-half-even). So
    //    doubles are decomposed with PURE IEEE arithmetic instead:
    //    hi = floor(x) and lo = floor((x - floor(x)) * 1e18 + 0.5).
    //    Identical operations on identical bits give identical
    //    integers in any IEEE-754 engine (no decimal-rendering rule
    //    involved), and the pair carries the exact integer part plus
    //    18 fractional digits - at least full double precision.
    //    Assumes finite values with |x| < 2^62 (every current output
    //    qualifies).
    //  - everything else: CAST AS VARCHAR/string.
    //  - NULL: 0x01 sentinel (concat_ws drops NULL args).
    def canon(c: String): org.apache.spark.sql.Column = dtypes(c) match {
      case "double" | "float" =>
        val d = col(c).cast("double")
        concat(floor(d).cast("string"), lit(":"),
          floor((d - floor(d)) * lit(1e18) + lit(0.5)).cast("string"))
      case _ => col(c).cast("string")
    }
    // 0x01 NULL sentinel — digest_check.py wraps with chr(1) identically
    val rowStr = concat_ws(",",
      cols.map(c => coalesce(canon(c), lit("\u0001"))): _*)
    val rowHash = conv(substring(md5(rowStr), 1, 15), 16, 10)
      .cast("decimal(38,0)")
    val r = df.select(
      count(lit(1)).as("rows"),
      coalesce(sum(rowHash), lit(java.math.BigDecimal.ZERO)
        .cast("decimal(38,0)")).as("digest")).head()
    println(s"""{"query":"$name","rows":${r.getLong(0)},"digest":"${r.getDecimal(1)}"}""")
    spark.stop()
  }
}
