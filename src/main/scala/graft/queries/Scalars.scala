package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GeoMean

/** Scalar functions, generators, UDx (SURVEY.md §2B #21, #33–#45).
  *
  * Everything except `slugify` (UDF, #43) and `GeoMean` (Aggregator,
  * #44) is `org.apache.spark.sql.functions._` built-ins → whole-stage
  * codegen, no interpretation overhead in the hot path.
  *
  * DuckDB dialect traps handled inline: `regexp_replace` needs 'g'
  * there, `ceil`/`floor` return DOUBLE there (BIGINT casts on both
  * sides), lists are 1-based there (Spark `element_at` is too, but
  * `posexplode` pos is 0-based), FLOAT must be cast to DOUBLE before
  * `round` (§2.5.2).
  */
object Scalars {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // ---- #21 q_approx_hll (no oracle — sketches are engine-specific) -------
  // HLL++ partial aggregation: mergeable sketch per partition, exact
  // count alongside so the ScalaTest can assert relative error < 5%.
  val qApproxHll: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
           countDistinct(col("user_id")).as("exact_users"))
      .orderBy("event_type")

  // ---- #21b q_approx_hll_sketch (no oracle — sketch bytes engine-specific)
  // Mergeable-sketch persistence (SURVEY §4.2): DataSketches HLL
  // sketches built per group, then UNIONED into a global estimate —
  // the pattern for incremental distinct-counting at 100 TB (store
  // per-partition/per-batch sketch bytes, merge on read; never
  // re-scan history). Output: per-type estimate + the same global
  // estimate on every row (flat, deterministic).
  val qApproxHllSketch: Q = (s, dir) => {
    val perType = Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val global = perType.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("global_users"))
    perType
      .select(col("event_type"), hll_sketch_estimate(col("sk")).as("approx_users"))
      .crossJoin(broadcast(global))
      .orderBy("event_type")
  }

  // ---- #33 q_str_funcs ---------------------------------------------------
  val qStrFuncs: Q = (s, dir) =>
    Tables.part(s, dir)
      .select(col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_brand")).as("brand_lower"),
        substring(col("p_name"), 1, 5).as("name_pre5"),
        concat(col("p_brand"), lit("|"), col("p_type")).as("brand_type"),
        trim(col("p_name")).as("name_trim"),
        regexp_replace(col("p_name"), " ", "_").as("name_underscored"),
        length(col("p_name")).as("name_len"),
        lpad(col("p_brand"), 12, "*").as("brand_padded"))
      .orderBy("p_partkey")

  val qStrFuncsSql: String =
    """SELECT p_partkey,
      |       UPPER(p_name) AS name_upper,
      |       LOWER(p_brand) AS brand_lower,
      |       SUBSTRING(p_name, 1, 5) AS name_pre5,
      |       p_brand || '|' || p_type AS brand_type,
      |       TRIM(p_name) AS name_trim,
      |       REPLACE(p_name, ' ', '_') AS name_underscored,
      |       CAST(LENGTH(p_name) AS INT) AS name_len,
      |       LPAD(p_brand, 12, '*') AS brand_padded
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // ---- #34 q_regex_funcs -------------------------------------------------
  // Common Java/RE2 subset only: char classes, anchors, +/* (§2B n.34).
  val qRegexFuncs: Q = (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        regexp_extract(col("o_orderpriority"), "^(\\d+)", 1).cast("int").as("prio_num"),
        regexp_replace(lower(col("o_orderpriority")), "[aeiou]", "").as("prio_consonants"),
        col("o_orderpriority").rlike("^[1-3]-").cast("int").as("is_high"))
      .orderBy("o_orderkey")

  val qRegexFuncsSql: String =
    """SELECT o_orderkey,
      |       CAST(regexp_extract(o_orderpriority, '^(\d+)', 1) AS INT) AS prio_num,
      |       regexp_replace(LOWER(o_orderpriority), '[aeiou]', '', 'g') AS prio_consonants,
      |       CAST(regexp_matches(o_orderpriority, '^[1-3]-') AS INT) AS is_high
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---- #35 q_date_funcs --------------------------------------------------
  // dow trap (§2B n.35): Spark weekday() is 0=Mon; DuckDB isodow is
  // 1=Mon → weekday()+1 ≡ isodow.
  val qDateFuncs: Q = (s, dir) => {
    val d = col("o_orderdate").cast("date")
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        year(d).as("y"), month(d).as("m"), dayofmonth(d).as("d"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        date_add(d, 30).as("plus30"),
        datediff(d, lit("1995-01-01").cast("date")).as("days_since_95"),
        last_day(d).as("month_end"),
        (weekday(d) + 1).as("iso_dow"))
      .orderBy("o_orderkey")
  }

  val qDateFuncsSql: String =
    """SELECT o_orderkey,
      |       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
      |       CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
      |       CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS d,
      |       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
      |       CAST(o_orderdate AS DATE) + 30 AS plus30,
      |       CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INT) AS days_since_95,
      |       LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
      |       CAST(ISODOW(o_orderdate) AS INT) AS iso_dow
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---- #36 q_math_funcs --------------------------------------------------
  val qMathFuncs: Q = (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        abs(dec(col("o_totalprice")) - 100000).cast("double").as("abs_delta"),
        ceil(col("o_totalprice")).as("price_ceil"),
        floor(col("o_totalprice")).as("price_floor"),
        round(dec(col("o_totalprice")), 1).cast("decimal(18,1)")
          .cast("double").as("price_r1"),
        round(sqrt(col("o_totalprice")), 6).as("price_sqrt"),
        round(ln(col("o_totalprice")), 6).as("price_ln"),
        pow(lit(2.0), (col("o_orderkey") % 10).cast("double")).cast("long").as("pow2"),
        (col("o_orderkey") % 7).as("mod7"))
      .orderBy("o_orderkey")

  val qMathFuncsSql: String =
    """SELECT o_orderkey,
      |       CAST(ABS(CAST(o_totalprice AS DECIMAL(18,2)) - 100000) AS DOUBLE) AS abs_delta,
      |       CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
      |       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
      |       CAST(CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)), 1) AS DECIMAL(18,1)) AS DOUBLE) AS price_r1,
      |       ROUND(SQRT(o_totalprice), 6) AS price_sqrt,
      |       ROUND(LN(o_totalprice), 6) AS price_ln,
      |       CAST(POWER(2.0, CAST(o_orderkey % 10 AS DOUBLE)) AS BIGINT) AS pow2,
      |       o_orderkey % 7 AS mod7
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---- #37 q_json_funcs --------------------------------------------------
  val qJsonFuncs: Q = (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k") >= 50)
      .orderBy("event_id")

  val qJsonFuncsSql: String = EV +
    """SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k
      |FROM e
      |WHERE CAST(json_extract(props, '$.k') AS INT) >= 50
      |ORDER BY event_id""".stripMargin

  // ---- #38 q_array_funcs -------------------------------------------------
  // float32 elements: cast to DOUBLE before round in BOTH engines
  // (verified trap, §2.5.2). Output stays flat: e1..e3, not a list.
  val qArrayFuncs: Q = (s, dir) =>
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        (round(element_at(col("embedding"), 1).cast("double"), 4) + lit(0.0)).as("e1"),
        (round(element_at(col("embedding"), 2).cast("double"), 4) + lit(0.0)).as("e2"),
        (round(element_at(col("embedding"), 3).cast("double"), 4) + lit(0.0)).as("e3"),
        (round(array_max(col("embedding")).cast("double"), 4) + lit(0.0)).as("emax"))
      .orderBy("vec_id")

  val qArrayFuncsSql: String =
    """SELECT vec_id,
      |       CAST(LEN(embedding) AS INT) AS dim,
      |       ROUND(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS e1,
      |       ROUND(CAST(embedding[2] AS DOUBLE), 4) + 0.0 AS e2,
      |       ROUND(CAST(embedding[3] AS DOUBLE), 4) + 0.0 AS e3,
      |       ROUND(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 4) + 0.0 AS emax
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin

  // ---- #39 q_array_hof ---------------------------------------------------
  // Higher-order functions: both engines fold the 64-element list
  // sequentially over identical doubles → bit-identical sums.
  val qArrayHof: Q = (s, dir) =>
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        round(sqrt(expr(
          "aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")), 6)
          .as("l2_norm"),
        expr("size(filter(embedding, x -> x > 0))").as("n_pos"))
      .orderBy("vec_id")

  val qArrayHofSql: String =
    """SELECT vec_id,
      |       ROUND(SQRT(list_sum(list_transform(embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
      |       CAST(LEN(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin

  // ---- #40 q_map_funcs ---------------------------------------------------
  // Map built and consumed inside the query; output is flat (§2.5.6).
  val qMapFuncs: Q = (s, dir) => {
    val m = map(lit("type"), col("event_type"),
                lit("uid"), col("user_id").cast("string"))
    Tables.events(s, dir)
      .select(col("event_id"),
        element_at(m, "type").as("type_val"),
        element_at(m, "uid").as("uid_str"))
      .orderBy("event_id")
  }

  val qMapFuncsSql: String = EV +
    """SELECT event_id, event_type AS type_val,
      |       CAST(user_id AS VARCHAR) AS uid_str
      |FROM e
      |ORDER BY event_id""".stripMargin

  // ---- #41 q_explode_words -----------------------------------------------
  // Generator + two-phase count: explode stays partition-local; only
  // the (word, partial count) pairs shuffle.
  val qExplodeWords: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(20)

  val qExplodeWordsSql: String =
    """SELECT word, COUNT(*) AS cnt FROM (
      |  SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word
      |ORDER BY cnt DESC, word
      |LIMIT 20""".stripMargin

  // ---- #42 q_posexplode --------------------------------------------------
  // Spark pos is 0-based → +1; DuckDB 1.0 lacks WITH ORDINALITY →
  // oracle indexes via generate_series (verified, §2B n.42).
  val qPosexplode: Q = (s, dir) =>
    Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 3)))
      .select(col("vec_id"), (col("pos") + 1).as("dim_idx"),
        (round(col("col").cast("double"), 4) + lit(0.0)).as("dim_val"))
      .orderBy("vec_id", "dim_idx")

  val qPosexplodeSql: String =
    """SELECT vec_id, CAST(g.i AS INT) AS dim_idx,
      |       ROUND(CAST(embedding[g.i] AS DOUBLE), 4) + 0.0 AS dim_val
      |FROM embeddings, generate_series(1, 3) g(i)
      |ORDER BY vec_id, dim_idx""".stripMargin

  // ---- #43 q_udf_scalar --------------------------------------------------
  // Scala UDF proven ≡ a declarative SQL spec by the oracle. (UDFs
  // break codegen fusion — acceptable for genuinely custom logic only.)
  private val slugifyFn: String => String = s =>
    if (s == null) null
    else s.toLowerCase.replaceAll("[^a-z0-9]+", "-").replaceAll("^-+|-+$", "")

  val qUdfScalar: Q = (s, dir) => {
    val slugify = udf(slugifyFn)
    Tables.part(s, dir)
      .select(col("p_partkey"), slugify(col("p_name")).as("slug"))
      .orderBy("p_partkey")
  }

  val qUdfScalarSql: String =
    """SELECT p_partkey,
      |       regexp_replace(regexp_replace(LOWER(p_name), '[^a-z0-9]+', '-', 'g'),
      |                      '^-+|-+$', '', 'g') AS slug
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // ---- #44 q_udaf_geomean ------------------------------------------------
  val qUdafGeomean: Q = (s, dir) => {
    val geomean = udaf(GeoMean)
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(geomean(col("l_quantity")), 6).as("geomean_qty"),
           count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  val qUdafGeomeanSql: String =
    """SELECT l_returnflag,
      |       ROUND(EXP(AVG(LN(l_quantity))), 6) AS geomean_qty,
      |       COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---- #45 q_udtf_daterange ----------------------------------------------
  val qUdtfDaterange: Q = (s, dir) =>
    Tables.orders(s, dir)
      .withColumn("m0", date_trunc("month", col("o_orderdate")).cast("date"))
      .select(col("o_orderkey"),
        explode(expr("sequence(m0, add_months(m0, 3), interval 1 month)")).as("month_date"))
      .orderBy("o_orderkey", "month_date")

  // DuckDB 1.0 can't lateral-join the generate_series TABLE function on
  // a column — use the scalar list form + UNNEST instead.
  val qUdtfDaterangeSql: String =
    """SELECT o_orderkey, CAST(m AS DATE) AS month_date FROM (
      |  SELECT o_orderkey,
      |         UNNEST(generate_series(
      |           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP),
      |           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) + INTERVAL 3 MONTH,
      |           INTERVAL 1 MONTH)) AS m
      |  FROM orders)
      |ORDER BY o_orderkey, month_date""".stripMargin

  // ------------------------------------------------------------------------
  val queries: Map[String, Q] = Map(
    "q_approx_hll" -> qApproxHll,
    "q_approx_hll_sketch" -> qApproxHllSketch,
    "q_str_funcs" -> qStrFuncs,
    "q_regex_funcs" -> qRegexFuncs,
    "q_date_funcs" -> qDateFuncs,
    "q_math_funcs" -> qMathFuncs,
    "q_json_funcs" -> qJsonFuncs,
    "q_array_funcs" -> qArrayFuncs,
    "q_array_hof" -> qArrayHof,
    "q_map_funcs" -> qMapFuncs,
    "q_explode_words" -> qExplodeWords,
    "q_posexplode" -> qPosexplode,
    "q_udf_scalar" -> qUdfScalar,
    "q_udaf_geomean" -> qUdafGeomean,
    "q_udtf_daterange" -> qUdtfDaterange,
  )

  val oracleSql: Map[String, String] = Map(
    "q_str_funcs" -> qStrFuncsSql,
    "q_regex_funcs" -> qRegexFuncsSql,
    "q_date_funcs" -> qDateFuncsSql,
    "q_math_funcs" -> qMathFuncsSql,
    "q_json_funcs" -> qJsonFuncsSql,
    "q_array_funcs" -> qArrayFuncsSql,
    "q_array_hof" -> qArrayHofSql,
    "q_map_funcs" -> qMapFuncsSql,
    "q_explode_words" -> qExplodeWordsSql,
    "q_posexplode" -> qPosexplodeSql,
    "q_udf_scalar" -> qUdfScalarSql,
    "q_udaf_geomean" -> qUdafGeomeanSql,
    "q_udtf_daterange" -> qUdtfDaterangeSql,
  )
}
