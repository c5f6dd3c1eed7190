package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Coverage queries closing the function-family gaps VERDICT.md flagged as
  * implemented-but-untested (H1–H8, D3, F3, G2, E1/E2), plus the scale-safe
  * banded reformulation of q13's global window.
  *
  * Same contract as [[Queries]]: every DOUBLE output rounded in-query,
  * aliases identical on both sides, total ORDER BY.
  */
object CoverageQueries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  // --- p0: type-render canary (SURVEY §2.3) --------------------------------
  // One literal row, one column per render class the driver's checker has
  // historically drifted on (r15: decimals; r18: timestamps). Pure literals:
  // any flip here is harness render drift, never data or operator drift —
  // ONE diagnostic row names the class instead of N scattered operator rows.
  // This is deliberately the ONLY oracle-hashed entry allowed to emit raw
  // TIMESTAMP columns (rule 8 exempts it by name).
  def p0(spark: SparkSession, dir: String): DataFrame =
    spark.range(1).select(
      lit("1995-06-15 12:34:56").cast("timestamp").as("ts_instant"),
      lit("1995-06-15 12:34:56").cast("timestamp_ntz").as("ts_ntz"),
      lit("1995-06-15").cast("date").as("d_date"),
      round(lit(1.23456), 2).as("dbl_round"),
      // rule 7: decimals dump as integer cents, never raw DECIMAL — the
      // decimal class is canaried in its sanctioned rendering
      (lit("1234.50").cast("decimal(12,2)") * 100).cast("long").as("dec_cents"),
      lit("abc").as("s_str"),
      lit(null).cast("int").as("i_null"),
      lit(true).as("b_bool"))

  val p0Sql: String =
    """SELECT TIMESTAMP '1995-06-15 12:34:56' AS ts_instant,
      |       TIMESTAMP '1995-06-15 12:34:56' AS ts_ntz,
      |       DATE '1995-06-15' AS d_date,
      |       round(1.23456, 2) AS dbl_round,
      |       CAST(CAST('1234.50' AS DECIMAL(12,2)) * 100 AS BIGINT) AS dec_cents,
      |       'abc' AS s_str,
      |       CAST(NULL AS INT) AS i_null,
      |       TRUE AS b_bool""".stripMargin

  // --- q13b: trailing 10-min sum WITHOUT a global window -------------------
  // q13's oracle shape (Window.orderBy with no partition) funnels every row
  // through one task — correct, but a scale-killer (VERDICT.md wrong #3).
  // This variant computes the identical answer as a banded self-join keyed
  // on 10-minute time buckets: each event contributes to its own bucket and
  // the next, targets join contributors on the bucket (keyed shuffle, no
  // single-task stage), and the band condition is a residual filter.
  def q13b(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Windows.bandedTrailingSum(
        t(spark, dir, "events"), "event_id", "ts", "value",
        windowMicros = 600000000L) // 10 minutes
      .select(col("event_id"), round(col("w_sum"), 2).as("w10"))
      .orderBy("event_id")

  // Identical semantics to q13 — reuse its oracle formulation.
  val q13bSql: String = Queries.q13Sql

  // --- q13c: trailing 10-min AVG + COUNT through the optimizer rewrite ----
  // The most common sliding metric a real user writes (VERDICT r5 missing
  // #1): an unpartitioned trailing-range AVERAGE. Declared as the ordinary
  // Window formulation; under Verify/Bench's
  // spark.graft.rewriteGlobalTrailingWindow=true the optimizer decomposes
  // AVG into banded sum/count partials and divides at the end, so the green
  // hash certifies the rewritten multi-partial plan (mixed with a plain
  // count in the same Window to exercise shared banding).
  // Parity note: `round(avg(double), 2)` flaked on 190/10000 `.xx5`
  // boundaries (the known Spark-HALF_UP vs DuckDB scale-then-round split).
  // Averaging exact integer CENTS instead makes the whole computation
  // bit-deterministic in IEEE double — partial sums of integers < 2⁵³ are
  // exact regardless of order, and both engines then divide the same two
  // exact values — so the raw double needs no rounding at all.
  def q13c(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(unix_micros(col("ts"))).rangeBetween(-600000000L, 0L)
    t(spark, dir, "events")
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select(
        col("event_id"),
        (avg("cents").over(w) / 100).as("a10"),
        count(lit(1)).over(w).as("n10"))
      .orderBy("event_id")
  }

  val q13cSql: String =
    """SELECT event_id,
      |       avg(CAST(round(value * 100) AS BIGINT)) OVER (ORDER BY ts
      |             RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW) / 100 AS a10,
      |       count(*) OVER (ORDER BY ts
      |             RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW) AS n10
      |FROM events ORDER BY event_id""".stripMargin

  // --- q25: math family (H3) -----------------------------------------------
  def q25(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(pow(col("l_quantity"), 2), 2).as("pq"),
        round(sqrt(col("l_extendedprice")), 4).as("sq"),
        round(log(col("l_extendedprice")), 4).as("lne"),
        round(log10(col("l_extendedprice")), 4).as("lg"),
        (col("l_quantity").cast("int") % 7).as("m"),
        signum(col("l_discount") - 0.05).cast("int").as("sg"),
        round(greatest(col("l_tax"), col("l_discount")), 2).as("g"),
        round(least(col("l_tax"), col("l_discount")), 2).as("l"))
      .orderBy("l_orderkey", "l_linenumber")

  val q25Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |       round(power(l_quantity, 2), 2) AS pq,
      |       round(sqrt(l_extendedprice), 4) AS sq,
      |       round(ln(l_extendedprice), 4) AS lne,
      |       round(log10(l_extendedprice), 4) AS lg,
      |       CAST(mod(CAST(l_quantity AS INT), 7) AS INT) AS m,
      |       CAST(sign(l_discount - 0.05) AS INT) AS sg,
      |       round(greatest(l_tax, l_discount), 2) AS g,
      |       round(least(l_tax, l_discount), 2) AS l
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  // --- q26: date/time family (H2) ------------------------------------------
  def q26(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate")).as("dd"),
        date_add(col("o_orderdate").cast("date"), 30).as("d30"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        // µs BIGINT, not TIMESTAMP (§2.3 rule 8)
        unix_micros(make_timestamp(
          year(col("o_orderdate")), month(col("o_orderdate")),
          dayofmonth(col("o_orderdate")), lit(12), lit(0), lit(0))).as("noon"))
      .orderBy("o_orderkey")

  val q26Sql: String =
    """SELECT o_orderkey,
      |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT) AS dd,
      |       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS d30,
      |       CAST(extract(year FROM o_orderdate) AS INT) AS y,
      |       CAST(extract(month FROM o_orderdate) AS INT) AS mo,
      |       CAST(extract(day FROM o_orderdate) AS INT) AS d,
      |       CAST(extract(quarter FROM o_orderdate) AS INT) AS q,
      |       epoch_us(make_timestamp(CAST(extract(year FROM o_orderdate) AS BIGINT),
      |                      CAST(extract(month FROM o_orderdate) AS BIGINT),
      |                      CAST(extract(day FROM o_orderdate) AS BIGINT),
      |                      12, 0, 0.0)) AS noon
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // --- q27: stddev/var/min/max (D3) ----------------------------------------
  // var_samp is scaled before rounding: both engines use stable one-pass
  // co-moments but merge order differs; stddev at 2dp and var/1e6 at 4dp
  // leave ~6 orders of magnitude of slack.
  def q27(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
        round(var_samp(col("l_extendedprice")) / 1e6, 4).as("var_price_m"),
        min(col("l_quantity")).as("min_q"),
        max(col("l_quantity")).as("max_q"),
        // µs BIGINT, not TIMESTAMP (§2.3 rule 8); cast is a no-op under UTC
        unix_micros(min(col("l_shipdate")).cast("timestamp")).as("min_ship"),
        unix_micros(max(col("l_shipdate")).cast("timestamp")).as("max_ship"))
      .orderBy("l_returnflag")

  val q27Sql: String =
    """SELECT l_returnflag,
      |       round(stddev_samp(l_quantity), 4) AS sd_qty,
      |       round(var_samp(l_quantity), 4) AS var_qty,
      |       round(stddev_samp(l_extendedprice), 2) AS sd_price,
      |       round(var_samp(l_extendedprice) / 1e6, 4) AS var_price_m,
      |       min(l_quantity) AS min_q, max(l_quantity) AS max_q,
      |       epoch_us(min(l_shipdate)) AS min_ship,
      |       epoch_us(max(l_shipdate)) AS max_ship
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --- q28: LIMIT/OFFSET (F3) ----------------------------------------------
  def q28(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(10).limit(20)
      .select("o_orderkey", "o_totalprice")

  val q28Sql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10""".stripMargin

  // --- q29: UNION distinct (G2) --------------------------------------------
  def q29(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events").select(col("event_type").as("v"))
      .union(t(spark, dir, "orders").select(col("o_orderstatus").as("v")))
      .distinct()
      .orderBy("v")

  val q29Sql: String =
    """SELECT event_type AS v FROM events
      |UNION SELECT o_orderstatus FROM orders ORDER BY v""".stripMargin

  // --- q30: regex + string family gaps (H1, B3) ----------------------------
  def q30(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(col("p_type").rlike("^[A-Z]"))
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("w1"),
        regexp_replace(col("p_type"), "[AEIOUaeiou]", "_").as("devow"),
        lpad(col("p_brand"), 12, "*").as("pad"),
        concat_ws("/", col("p_brand"), col("p_type")).as("cw"),
        instr(col("p_name"), "a").cast("int").as("ia"),
        col("p_name").startsWith("a").as("sa"))
      .orderBy("p_partkey")

  val q30Sql: String =
    """SELECT p_partkey,
      |       regexp_extract(p_name, '([a-z]+)', 1) AS w1,
      |       regexp_replace(p_type, '[AEIOUaeiou]', '_', 'g') AS devow,
      |       lpad(p_brand, 12, '*') AS pad,
      |       concat_ws('/', p_brand, p_type) AS cw,
      |       CAST(instr(p_name, 'a') AS INT) AS ia,
      |       starts_with(p_name, 'a') AS sa
      |FROM part WHERE regexp_matches(p_type, '^[A-Z]')
      |ORDER BY p_partkey""".stripMargin

  // --- q31: ntile / first_value / last_value (E1, E2) ----------------------
  def q31(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"), col("o_custkey"),
        ntile(4).over(w).as("q"),
        first_value(col("o_orderkey")).over(w).as("fo"),
        last_value(col("o_orderkey")).over(wFull).as("lo"))
      .orderBy("o_orderkey")
  }

  val q31Sql: String =
    """SELECT o_orderkey, o_custkey, ntile(4) OVER w AS q,
      |       first_value(o_orderkey) OVER w AS fo,
      |       last_value(o_orderkey) OVER
      |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lo
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // --- q32: map functions over shredded JSON (H4, H6) ----------------------
  def q32(spark: SparkSession, dir: String): DataFrame = {
    val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.IntegerType))
    t(spark, dir, "events")
      .select(
        col("event_id"),
        element_at(m, "k").as("k"),
        size(map_keys(m)).as("nk"),
        element_at(map_values(m), 1).as("v1"))
      .orderBy("event_id")
  }

  val q32Sql: String =
    """SELECT event_id,
      |       CAST(json_extract(props, '$.k') AS INT) AS k,
      |       CAST(len(json_keys(props)) AS INT) AS nk,
      |       CAST(json_extract(props, '$.k') AS INT) AS v1
      |FROM events ORDER BY event_id""".stripMargin

  // --- q33: hash family (H7) -----------------------------------------------
  def q33(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        md5(col("text")).as("m"),
        sha2(col("text"), 256).as("s"))
      .orderBy("doc_id")

  val q33Sql: String =
    """SELECT doc_id, md5(text) AS m, sha256(text) AS s
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- q34: URL parsing (H8) -----------------------------------------------
  // URLs synthesized from documents columns; DuckDB re-parses the same
  // string with regexes (no parse_url there).
  def q34(spark: SparkSession, dir: String): DataFrame = {
    val url = concat(
      lit("https://"), col("source"), lit(".example.com/d/"),
      col("doc_id"), lit("?lang="), col("lang"), lit("&v=2"))
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY")).as("query"),
        parse_url(url, lit("QUERY"), lit("lang")).as("qlang"))
      .orderBy("doc_id")
  }

  val q34Sql: String =
    """SELECT doc_id,
      |       regexp_extract(u, 'https://([^/]+)', 1) AS host,
      |       regexp_extract(u, 'https://[^/]+(/[^?]*)', 1) AS path,
      |       regexp_extract(u, '\?(.*)$', 1) AS query,
      |       regexp_extract(u, '[?&]lang=([^&]*)', 1) AS qlang
      |FROM (SELECT doc_id,
      |        'https://' || source || '.example.com/d/' || doc_id ||
      |        '?lang=' || lang || '&v=2' AS u
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  // --- q35: salted aggregation (skew mitigation, SURVEY §4) ----------------
  // The salt only changes physical distribution; the oracle is the PLAIN
  // GROUP BY — hash-matching proves the two-phase rewrite is value-exact.
  def q35(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Skew.saltedStats(
        t(spark, dir, "events"), Seq("user_id"), "value", saltBuckets = 8)
      .select(
        col("user_id"), col("count"),
        round(col("sum"), 2).as("sum"),
        round(col("min"), 2).as("min"),
        round(col("max"), 2).as("max"))
      .orderBy("user_id")

  val q35Sql: String =
    """SELECT user_id, count(*) AS count, round(sum(value),2) AS sum,
      |       round(min(value),2) AS min, round(max(value),2) AS max
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // --- q36: token counting — whitespace + BPE-ish regex (K5) ---------------
  // The regex pre-tokenizer splits letter runs / digit runs / punctuation
  // runs (the GPT-2-style pre-tokenization shape, RE2-compatible so the
  // DuckDB oracle evaluates the identical pattern).
  private val bpeIsh = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"

  def q36(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("lang"),
        size(split(trim(col("text")), "\\s+")).as("ws"),
        // Spark's SQL string literal consumes backslash escapes ('\s'→'s'),
        // DuckDB's does not — escape for the Spark side only
        size(expr(s"regexp_extract_all(text, '${bpeIsh.replace("\\", "\\\\")}', 0)"))
          .as("bpe"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("ws").as("ws_tokens"),
        sum("bpe").as("bpe_tokens"))
      .orderBy("lang")

  val q36Sql: String =
    s"""SELECT lang, count(*) AS n_docs,
       |       CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
       |         AS ws_tokens,
       |       CAST(sum(len(regexp_extract_all(text, '$bpeIsh'))) AS BIGINT)
       |         AS bpe_tokens
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // --- q37: RIGHT OUTER join (C3) ------------------------------------------
  // orders ⟖ customer: customers with no orders surface as null-side rows;
  // the aggregate proves the null side survives (n_no_orders > 0).
  def q37(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(t(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"), "right")
      .groupBy("c_nationkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("n_no_orders"))
      .orderBy("c_nationkey")

  val q37Sql: String =
    """SELECT c_nationkey, count(o_orderkey) AS n_orders, count(*) AS n_rows,
      |       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_no_orders
      |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // --- q38: FULL OUTER join (C3) -------------------------------------------
  // Asymmetric filters make BOTH null sides non-empty at the oracle SF
  // (7 supplier-only + 8 customer-only nations at sf0.01).
  def q38(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").filter(col("c_acctbal") > 9900)
      .groupBy(col("c_nationkey").as("c_nk")).agg(count(lit(1)).as("n_cust"))
    val s = t(spark, dir, "supplier").filter(col("s_acctbal") > 8000)
      .groupBy(col("s_nationkey").as("s_nk")).agg(count(lit(1)).as("n_supp"))
    c.join(s, col("c_nk") === col("s_nk"), "full_outer")
      .select(
        coalesce(col("c_nk"), col("s_nk")).as("nationkey"),
        col("n_cust"), col("n_supp"))
      .orderBy("nationkey")
  }

  val q38Sql: String =
    """SELECT coalesce(c.nk, s.nk) AS nationkey, n_cust, n_supp
      |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer
      |      WHERE c_acctbal > 9900 GROUP BY 1) c
      |FULL OUTER JOIN
      |     (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier
      |      WHERE s_acctbal > 8000 GROUP BY 1) s
      |ON c.nk = s.nk
      |ORDER BY nationkey""".stripMargin

  // --- q39: pure non-equi join → BroadcastNestedLoopJoin (C6) --------------
  // The ONLY join condition is an inequality band over a broadcast 4-row
  // table, so the planner must pick BNLJ (plan-locked in PlanSpec). Safe at
  // any scale because the inner side is a constant-size band list.
  def q39(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("low", 0.0, 50.0), ("mid", 50.0, 150.0),
      ("high", 150.0, 300.0), ("vhigh", 300.0, 1e6))
      .toDF("band", "lo", "hi")
    t(spark, dir, "events")
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("band")
  }

  val q39Sql: String =
    """SELECT band, count(*) AS n, round(sum(value),2) AS v
      |FROM events
      |JOIN (VALUES ('low',0.0,50.0),('mid',50.0,150.0),
      |             ('high',150.0,300.0),('vhigh',300.0,1000000.0))
      |       AS b(band,lo,hi)
      |  ON value >= lo AND value < hi
      |GROUP BY band ORDER BY band""".stripMargin

  // --- q40: uuid() + crc32 (H7 tail) ---------------------------------------
  // uuid() is nondeterministic, so the check is structural: every generated
  // id is RFC-4122 v4-shaped and distinct. crc32 is checked as
  // collision-free over the corpus's distinct texts (deterministic at the
  // oracle SF; count(DISTINCT text) on the oracle side).
  private val uuidV4Re =
    "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"

  def q40(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(expr("uuid()").as("u"), col("text"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("u")).as("n_uuid_distinct"),
        sum(when(col("u").rlike(uuidV4Re), 1L).otherwise(0L)).as("n_uuid_v4"),
        countDistinct(crc32(col("text"))).as("crc_d"),
        countDistinct(col("text")).as("txt_d"))
      // 32-bit crc32 expects ~d²/2³³ birthday collisions, so equality with
      // count(DISTINCT text) stops holding near ~77k distinct texts (ADVICE
      // r3). Check injectivity-up-to-expected-collisions as a boolean with a
      // d²/2³¹ allowance (≈4× the expectation, floor 1) instead of exact
      // equality, so the entry stays green at every scale factor. The square
      // is computed in double — a LongType d² overflows (and under ANSI,
      // throws) past ~3e9 distinct texts (ADVICE r4); doubles lose only
      // ulp-level precision there, irrelevant to a ≥ slack bound.
      .select(
        col("n"), col("n_uuid_distinct"), col("n_uuid_v4"),
        (col("crc_d") >= col("txt_d") -
          greatest(lit(1.0),
            col("txt_d").cast("double") * col("txt_d").cast("double")
              / lit(2147483648.0)).cast("long"))
          .as("crc_ok"))

  val q40Sql: String =
    """SELECT count(*) AS n, count(*) AS n_uuid_distinct, count(*) AS n_uuid_v4,
      |       TRUE AS crc_ok
      |FROM documents""".stripMargin

  // --- q41: string family long tail (H1) -----------------------------------
  // levenshtein / translate / reverse / ascii / repeat / substring_index —
  // all codegen'd built-ins with exact DuckDB equivalents (substring_index
  // ≡ split_part for positive indexes).
  def q41(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        levenshtein(col("p_brand"), col("p_type")).as("lev"),
        translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
        reverse(col("p_brand")).as("rev"),
        ascii(col("p_name")).as("a0"),
        repeat(col("p_brand"), 2).as("rep"),
        substring_index(col("p_type"), " ", 1).as("w0"))
      .orderBy("p_partkey")

  val q41Sql: String =
    """SELECT p_partkey,
      |       CAST(levenshtein(p_brand, p_type) AS INT) AS lev,
      |       translate(p_name, 'aeiou', 'AEIOU') AS tr,
      |       reverse(p_brand) AS rev,
      |       CAST(ascii(p_name) AS INT) AS a0,
      |       repeat(p_brand, 2) AS rep,
      |       split_part(p_type, ' ', 1) AS w0
      |FROM part ORDER BY p_partkey""".stripMargin

  // --- q42: date/time family long tail (H2) --------------------------------
  // last_day / add_months (end-of-month clamped in both engines) / ISO
  // weekofyear / dayofweek (Spark 1=Sunday ≡ DuckDB dow+1) / epoch seconds.
  def q42(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        last_day(col("o_orderdate")).as("ld"),
        add_months(col("o_orderdate"), 3).as("am"),
        weekofyear(col("o_orderdate")).as("wy"),
        dayofweek(col("o_orderdate")).as("dw"),
        unix_timestamp(col("o_orderdate")).as("ut"))
      .orderBy("o_orderkey")

  val q42Sql: String =
    """SELECT o_orderkey,
      |       last_day(o_orderdate) AS ld,
      |       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS am,
      |       CAST(extract(week FROM o_orderdate) AS INT) AS wy,
      |       CAST(extract(dow FROM o_orderdate) + 1 AS INT) AS dw,
      |       CAST(epoch(o_orderdate) AS BIGINT) AS ut
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // --- q43: pure-SQL surface with registered native functions --------------
  // A user on the SQL API (spark.sql, no Column DSL) gets the graft
  // expressions by name after GraftFunctions.register — the declared entry
  // proves the whole path end-to-end: temp view, SQL text, codegen'd
  // custom expressions inside a SQL projection, value-checked vs DuckDB.
  def q43(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    t(spark, dir, "embeddings").createOrReplaceTempView("embeddings_v")
    spark.sql(
      """SELECT e.vec_id,
        |       round(cosine_sim(e.embedding, q.embedding), 4) + 0.0 AS cos,
        |       round(l2_norm(e.embedding), 4) AS l2
        |FROM embeddings_v e
        |CROSS JOIN (SELECT embedding FROM embeddings_v WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0 AND e.vec_id < 100
        |ORDER BY e.vec_id""".stripMargin)
  }

  val q43Sql: String =
    """WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      |           FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id,
      |       round(list_inner_product(ev, qv)
      |             / (sqrt(list_inner_product(ev, ev)) * sqrt(list_inner_product(qv, qv))), 4)
      |         AS cos,
      |       round(sqrt(list_inner_product(ev, ev)), 4) AS l2
      |FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
      |      FROM embeddings WHERE vec_id <> 0 AND vec_id < 100), q
      |ORDER BY vec_id""".stripMargin

  // --- q44: exact percentiles + correlation/covariance (D3/D6 exact tier) --
  // percentile() is the EXACT sort-based aggregate (q22 covers the sketch
  // tier); quartile interpolation lands on .0025 granularity for 2-dp
  // inputs, so 4-dp rounding is identity-safe across engines. covar is
  // scaled before rounding (q27 rule).
  def q44(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("med_qty"),
        // BOTH price quantiles from one buffered aggregate — two scalar
        // percentile() calls on the same column would each hold the full
        // per-group value map (measured: 2.9 s → 2.1 s at sf0.1); the
        // array stays internal, the driver-visible columns are scalars
        expr("percentile(l_extendedprice, array(0.25D, 0.75D))").as("__pp"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")) / 1e3, 4)
          .as("cov_qp_k"))
      .select(
        col("l_returnflag"), col("med_qty"),
        round(element_at(col("__pp"), 1), 4).as("p25_price"),
        round(element_at(col("__pp"), 2), 4).as("p75_price"),
        col("corr_qp"), col("cov_qp_k"))
      .orderBy("l_returnflag")

  val q44Sql: String =
    """SELECT l_returnflag,
      |       round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
      |       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
      |       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price,
      |       round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
      |       round(covar_samp(l_quantity, l_extendedprice) / 1e3, 4) AS cov_qp_k
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --- q45: GROUPING SETS + grouping() markers (D7 beyond rollup/cube) -----
  // NULL ordering differs across engines (Spark ASC = NULLS FIRST, DuckDB
  // NULLS LAST), so the total order goes through the grouping flags and
  // coalesced keys.
  def q45(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(grouping(o_orderstatus) AS INT) AS g1,
        |       CAST(grouping(o_orderpriority) AS INT) AS g2,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS rev
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g1, g2, coalesce(o_orderstatus, ''), coalesce(o_orderpriority, '')
        |""".stripMargin)
  }

  val q45Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(grouping(o_orderstatus) AS INT) AS g1,
      |       CAST(grouping(o_orderpriority) AS INT) AS g2,
      |       count(*) AS n, round(sum(o_totalprice), 2) AS rev
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g1, g2, coalesce(o_orderstatus, ''), coalesce(o_orderpriority, '')""".stripMargin

  // --- q46: scalar + correlated + IN subqueries in SQL form (B/C SQL tier) -
  // Catalyst decorrelates the per-customer count into a left outer
  // aggregate join and the IN into a semi join — the SQL-surface route to
  // the same physical shapes q4/q5 lock via the DSL.
  def q46(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("customer_v")
    t(spark, dir, "orders").createOrReplaceTempView("orders_v")
    t(spark, dir, "nation").createOrReplaceTempView("nation_v")
    spark.sql(
      """SELECT c_custkey,
        |       (SELECT count(*) FROM orders_v o
        |        WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer_v c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_v)
        |  AND c_nationkey IN (SELECT n_nationkey FROM nation_v
        |                      WHERE n_regionkey = 1)
        |ORDER BY c_custkey""".stripMargin)
  }

  val q46Sql: String =
    """SELECT c_custkey,
      |       (SELECT count(*) FROM orders o
      |        WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      |  AND c_nationkey IN (SELECT n_nationkey FROM nation
      |                      WHERE n_regionkey = 1)
      |ORDER BY c_custkey""".stripMargin

  // --- q47: pivot (wide per-category columns) ------------------------------
  // Explicit value list keeps the schema static (an unlisted category can't
  // widen the output at 100 TB); each cell is a conditional aggregate, so
  // the oracle is plain CASE aggregation.
  private val eventTypes = Seq("click", "view", "purchase", "signup", "error")

  def q47(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(round(sum("value"), 2))
      .na.fill(0.0, eventTypes)
      .orderBy("user_id")

  val q47Sql: String = {
    val cells = eventTypes.map(t =>
      s"coalesce(round(sum(CASE WHEN event_type = '$t' THEN value END), 2), 0) AS $t")
      .mkString(",\n       ")
    s"""SELECT user_id,
       |       $cells
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // --- q48: unpivot / melt (long form) -------------------------------------
  def q48(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_tax", "l_discount")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_tax"), col("l_discount")),
        "metric", "val")
      .orderBy("l_orderkey", "l_linenumber", "metric")

  val q48Sql: String =
    """SELECT l_orderkey, l_linenumber, metric, val FROM (
      |  SELECT l_orderkey, l_linenumber, 'l_tax' AS metric, l_tax AS val
      |  FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      |  FROM lineitem)
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin

  // --- q55: ANALYZE-style table profile (one-pass column stats) ------------
  // The data-quality sweep before trusting a new drop: per-column
  // null/distinct/min/max in ONE aggregation pass, long-format
  // ([[graft.ops.Profile]]). The entry runs the EXACT tier (countDistinct
  // — oracle-able); the HLL tier (`exact = false`, no Expand in the plan)
  // is the 100 TB routine default, plan-locked in ProfileSpec. Profiled
  // columns are bigints/strings only, so the min/max string renders are
  // byte-identical across engines (doubles would not be).
  def q55(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Profile
      .profile(t(spark, dir, "events"),
        Seq("event_id", "user_id", "event_type", "props"))
      .orderBy("col_name")

  val q55Sql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS col_name,
         |       (SELECT count(*) FROM events) AS n_rows,
         |       count(*) - count($c) AS n_null,
         |       count(DISTINCT $c) AS n_distinct,
         |       CAST(min($c) AS VARCHAR) AS min_val,
         |       CAST(max($c) AS VARCHAR) AS max_val
         |FROM events""".stripMargin
    Seq("event_id", "user_id", "event_type", "props")
      .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // --- q56: mergeable distinct sketches (incremental profiling, D5+) -------
  // The scale path for q55's distinct counts when the table arrives in
  // pieces: sketch each day ONCE (DataSketches HLL via Spark's
  // hll_sketch_agg), persist the model-sized sketches, answer global
  // distinct questions by UNIONING sketches — never re-scanning history
  // (the same incremental-state play as the k19 index, applied to
  // profiling; the L4 sketches prove mergeability for quantiles/heavy
  // hitters, this closes it for distinct counts with Spark's own
  // built-in). Gates (§2.2a — DuckDB cannot re-derive DataSketches
  // registers): the union of per-day sketches must estimate within 1%+1
  // of the one-pass sketch (register merge is lossless once dense, but a
  // per-day sketch still in SPARSE mode can promote a register
  // differently than the one-pass stream did — measured at sf0.1: 1500
  // exact, estimates differ by a few counts), and the estimate must sit
  // within 5% of the exact count, which IS a value column.
  def q56(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val perDay = ev.groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = perDay
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_merged"))
    ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_direct"),
      countDistinct(col("user_id")).as("nd_exact"))
      .crossJoin(merged)
      .select(
        col("nd_exact"),
        (abs(col("est_merged") - col("est_direct")) <=
          col("est_direct") / 100L + 1L).as("merge_close"),
        (abs(col("est_merged") - col("nd_exact")) <=
          col("nd_exact") / 20L + 1L).as("within_5pct"))
  }

  val q56Sql: String =
    """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nd_exact,
      |       true AS merge_close,
      |       true AS within_5pct
      |FROM events""".stripMargin

  // --- q57: VARIANT semi-structured path (H4, Spark 4 surface) -------------
  // The Spark-4-native way to query semi-structured columns: parse once
  // into VARIANT (a typed binary encoding the scan can push into —
  // contrast q18's get_json_object, which re-parses the string per
  // extraction), then typed `variant_get` paths; `try_variant_get` is the
  // total variant (NULL, never throw, for absent paths — the bad-rows
  // philosophy applied to paths). Oracle: DuckDB's JSON path operators
  // over the same strings; outputs all integer.
  def q57(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'long')").as("k"),
        expr("try_variant_get(parse_json(props), '$.absent', 'long')")
          .as("miss"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"),
        count(col("miss")).as("n_miss"))
      .orderBy("event_type")

  val q57Sql: String =
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(k) AS BIGINT) AS sum_k,
      |       CAST(min(k) AS BIGINT) AS min_k,
      |       CAST(max(k) AS BIGINT) AS max_k,
      |       CAST(0 AS BIGINT) AS n_miss
      |FROM (SELECT event_type, CAST(props ->> '$.k' AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- q49: window long tail — percent_rank / cume_dist / nth_value (E1+) --
  // percent_rank = (rank-1)/(n-1) and cume_dist = peers≤/n are exact
  // rationals computed identically in double by both engines, so no
  // rounding is needed; the unique o_orderkey tiebreak makes every frame
  // deterministic. nth_value uses the default RANGE UNBOUNDED PRECEDING →
  // CURRENT ROW frame on both sides (rows 1 of a partition see NULL).
  def q49(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"), col("o_custkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
      .orderBy("o_orderkey")
  }

  val q49Sql: String =
    """SELECT o_orderkey, o_custkey,
      |       percent_rank() OVER w AS pr,
      |       cume_dist() OVER w AS cd,
      |       nth_value(o_orderkey, 2) OVER w AS second_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // --- q50: LATERAL correlated subquery join (C SQL tier) -------------------
  // Catalyst decorrelates the per-order aggregate lateral into a left outer
  // aggregate join (DecorrelateInnerQuery) — a keyed shuffle, never a
  // per-row re-scan, which is what makes the construct usable at 100 TB.
  // The aggregate subquery always yields exactly one row, so `, LATERAL`
  // (cross) and JOIN LATERAL coincide. Money sum goes through integer
  // cents for bit-deterministic double parity (q13c rule).
  def q50(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_v")
    t(spark, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT o.o_orderkey, t.n_items, t.max_price, t.charged
        |FROM orders_v o,
        |LATERAL (
        |  SELECT count(*) AS n_items,
        |         max(l.l_extendedprice) AS max_price,
        |         sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
        |                  AS BIGINT)) / 100 AS charged
        |  FROM lineitem_v l WHERE l.l_orderkey = o.o_orderkey) t
        |ORDER BY o.o_orderkey""".stripMargin)
  }

  val q50Sql: String =
    """SELECT o.o_orderkey, t.n_items, t.max_price, t.charged
      |FROM orders o,
      |LATERAL (
      |  SELECT count(*) AS n_items,
      |         max(l.l_extendedprice) AS max_price,
      |         sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
      |                  AS BIGINT)) / 100 AS charged
      |  FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) t
      |ORDER BY o.o_orderkey""".stripMargin

  // --- q51: recursive CTE (Spark 4.x UnionLoop) ------------------------------
  // A generated monthly calendar — the recursion — left-joined to monthly
  // order totals. Recursing over an INT and converting via make_date keeps
  // both engines on DATE (date+interval returns TIMESTAMP in DuckDB, and
  // date_trunc diverges the same way — make_date(year, month, 1) does not).
  // Spark executes the loop as UnionLoopExec (driver-iterated, each step a
  // distributed batch); depth = months, not rows, so the 100 TB cost is the
  // join, not the recursion.
  def q51(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
      """WITH RECURSIVE cal(i) AS (
        |  SELECT 0
        |  UNION ALL
        |  SELECT i + 1 FROM cal WHERE i < 79
        |)
        |SELECT make_date(1995 + i div 12, 1 + i % 12, 1) AS mon,
        |       count(o.o_orderkey) AS n,
        |       sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100 AS rev
        |FROM cal LEFT JOIN orders_v o
        |  ON make_date(year(o.o_orderdate), month(o.o_orderdate), 1)
        |     = make_date(1995 + i div 12, 1 + i % 12, 1)
        |GROUP BY mon ORDER BY mon""".stripMargin)
  }

  val q51Sql: String =
    """WITH RECURSIVE cal(i) AS (
      |  SELECT 0
      |  UNION ALL
      |  SELECT i + 1 FROM cal WHERE i < 79
      |)
      |SELECT make_date(1995 + i // 12, 1 + i % 12, 1) AS mon,
      |       count(o.o_orderkey) AS n,
      |       sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100 AS rev
      |FROM cal LEFT JOIN orders o
      |  ON make_date(year(o.o_orderdate), month(o.o_orderdate), 1)
      |     = make_date(1995 + i // 12, 1 + i % 12, 1)
      |GROUP BY mon ORDER BY mon""".stripMargin

  val declared: Seq[(String, QFn, Option[String])] = Seq(
    ("p0_type_canary", p0 _, Some(p0Sql)),
    ("q49_pctrank_cumedist", q49 _, Some(q49Sql)),
    ("q50_lateral_join", q50 _, Some(q50Sql)),
    ("q51_recursive_cte", q51 _, Some(q51Sql)),
    ("q47_pivot", q47 _, Some(q47Sql)),
    ("q48_unpivot", q48 _, Some(q48Sql)),
    ("q55_table_profile", q55 _, Some(q55Sql)),
    ("q56_mergeable_distinct", q56 _, Some(q56Sql)),
    ("q57_variant_paths", q57 _, Some(q57Sql)),
    ("q44_exact_stats", q44 _, Some(q44Sql)),
    ("q45_grouping_sets", q45 _, Some(q45Sql)),
    ("q46_subqueries", q46 _, Some(q46Sql)),
    ("q43_sql_surface", q43 _, Some(q43Sql)),
    ("q41_strings2", q41 _, Some(q41Sql)),
    ("q42_dates2", q42 _, Some(q42Sql)),
    ("q37_right_outer", q37 _, Some(q37Sql)),
    ("q38_full_outer", q38 _, Some(q38Sql)),
    ("q39_bnlj_bands", q39 _, Some(q39Sql)),
    ("q40_uuid_crc", q40 _, Some(q40Sql)),
    ("q35_salted_agg", q35 _, Some(q35Sql)),
    ("q36_token_count", q36 _, Some(q36Sql)),
    ("q13b_banded_window", q13b _, Some(q13bSql)),
    ("q13c_avg_range_frame", q13c _, Some(q13cSql)),
    ("q25_math2", q25 _, Some(q25Sql)),
    ("q26_dates", q26 _, Some(q26Sql)),
    ("q27_stats", q27 _, Some(q27Sql)),
    ("q28_offset", q28 _, Some(q28Sql)),
    ("q29_union_distinct", q29 _, Some(q29Sql)),
    ("q30_regex_strings", q30 _, Some(q30Sql)),
    ("q31_ntile_firstlast", q31 _, Some(q31Sql)),
    ("q32_map_functions", q32 _, Some(q32Sql)),
    ("q33_hashes", q33 _, Some(q33Sql)),
    ("q34_parse_url", q34 _, Some(q34Sql))
  )
}
