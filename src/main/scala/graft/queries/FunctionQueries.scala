package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-function and window queries (SURVEY.md §2.5, §2.8) with
  * DuckDB oracles. All expressions are Spark built-ins → whole-stage
  * codegen, no UDFs.
  */
object FunctionQueries {

  /** §2.5 — ranking window: first 3 orders per customer by date.
    * Partition-local sort after one shuffle on o_custkey.
    */
  def q9WindowRank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q9Sql: String =
    """SELECT o_custkey, o_orderkey, rn FROM (
      |  SELECT o_custkey, o_orderkey,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** §2.5 — rolling window: trailing-4 average of event values per user.
    * Frame-bound aggregation fixes the summation order → deterministic
    * doubles without rounding tricks (still rounded for safety).
    */
  def q10Rolling(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(-3, 0)
    Tables(spark, dir, "events")
      .withColumn("rolling_avg", round(avg(col("value")).over(w), 4))
      .select(col("event_id"), col("user_id"), col("rolling_avg"))
      .orderBy(col("event_id"))
  }

  val q10Sql: String =
    """SELECT event_id, user_id,
      |  round(avg(value) OVER (PARTITION BY user_id ORDER BY event_id
      |        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS rolling_avg
      |FROM events ORDER BY event_id""".stripMargin

  /** §2.8 JSON — regex-schema extraction from the events `props` JSON
    * string (the reference parses JSON lines ad hoc,
    * `utils/io_helpers.py:11-16`).
    */
  def q13JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int"))
      .groupBy(col("event_type"))
      .agg(round(avg(col("k")), 4).as("avg_k"),
           max(col("k")).as("max_k"),
           count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  val q13Sql: String =
    """SELECT event_type,
      |  round(avg(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT)), 4) AS avg_k,
      |  max(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT)) AS max_k,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** §2.8 strings — upper/lower/length/concat_ws batch. */
  def q14Strings(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .filter(col("p_partkey") < 500)
      .select(col("p_partkey"),
              upper(col("p_name")).as("up_name"),
              lower(col("p_type")).as("lo_type"),
              length(col("p_name")).as("name_len"),
              concat_ws("|", col("p_brand"), col("p_type")).as("tag"))
      .orderBy(col("p_partkey"))

  val q14Sql: String =
    """SELECT p_partkey, upper(p_name) AS up_name, lower(p_type) AS lo_type,
      |  length(p_name) AS name_len, concat_ws('|', p_brand, p_type) AS tag
      |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin

  /** §2.8 hash — stable md5 cache keys over concatenated columns
    * (the reference's sha1 cache key, `plotting_impl.py:93-100`).
    */
  def q15HashKey(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .filter(col("o_orderkey") < 1000)
      .select(col("o_orderkey"),
              md5(concat_ws("|", col("o_orderkey"), col("o_orderstatus"))).as("cache_key"))
      .orderBy(col("o_orderkey"))

  val q15Sql: String =
    """SELECT o_orderkey,
      |  md5(concat_ws('|', o_orderkey, o_orderstatus)) AS cache_key
      |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin

  /** S10 — per-line dispatch (CASE routing), the mixed-format line router
    * shape aggregated by route.
    */
  def q16CaseRoute(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("route",
        when(col("event_type").isin("click", "view"), "engagement")
          .when(col("event_type").isin("purchase", "signup"), "conversion")
          .otherwise("other"))
      .groupBy(col("route"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("value").cast("decimal(18,6)")), 2)
             .cast("double").as("total_value"))
      .orderBy(col("route"))

  val q16Sql: String =
    """SELECT CASE WHEN event_type IN ('click','view') THEN 'engagement'
      |  WHEN event_type IN ('purchase','signup') THEN 'conversion'
      |  ELSE 'other' END AS route,
      |  count(*) AS n,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
      |FROM events GROUP BY route ORDER BY route""".stripMargin

  /** §2.8 date/time — orders per month. */
  def q21Monthly(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .withColumn("month", to_date(date_trunc("month", col("o_orderdate"))))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice").cast("decimal(18,4)")), 2)
             .cast("double").as("total_price"))
      .orderBy(col("month"))

  val q21Sql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |  count(*) AS n_orders,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
      |FROM orders GROUP BY month ORDER BY month""".stripMargin

  /** §2.5 — sessionization: gap-based session ids via lag + running sum,
    * then per-session stats. The standard large-scale event-pipeline
    * pattern: two window passes over one shuffle on user_id.
    */
  def q23Sessionize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables(spark, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
             col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_sess")).over(byUser))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
           // decimal sum → summation-order-independent, then back to double
           round(sum(col("value").cast("decimal(18,6)")), 2).cast("double")
             .as("session_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  val q23Sql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, ts, value,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
      |  FROM events),
      |s AS (
      |  SELECT user_id, event_id, value,
      |    CAST(sum(CASE WHEN prev_ts IS NULL
      |             OR date_diff('second', prev_ts, ts) > 1800
      |        THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS session_idx
      |  FROM g)
      |SELECT user_id, session_idx, count(*) AS n_events,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS session_value
      |FROM s GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  /** §2.5 — RANGE-framed window: trailing-1-hour count/sum per user,
    * keyed on truncated epoch seconds so peers group identically in
    * both engines.
    */
  def q48RangeWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-3600, 0)
    Tables(spark, dir, "events")
      .filter(col("event_id") < 3000)
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_1h"),
        round(sum(col("value").cast("decimal(18,6)")).over(w), 2)
          .cast("double").as("v_1h"))
      .orderBy(col("event_id"))
  }

  val q48Sql: String =
    """SELECT event_id, user_id,
      |  count(*) OVER w AS n_1h,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER w, 2) AS DOUBLE) AS v_1h
      |FROM events
      |WHERE event_id < 3000
      |WINDOW w AS (PARTITION BY user_id
      |             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** §2.4 — CUBE over (segment, nation): all 4 grouping combinations in
    * one pass/shuffle (A7's rollup generalized).
    */
  def q49Cube(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .cube(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("c_acctbal").cast("decimal(18,4)")), 2)
             .cast("double").as("total_bal"))
      .orderBy(col("c_mktsegment").asc_nulls_first,
               col("c_nationkey").asc_nulls_first)

  val q49Sql: String =
    """SELECT c_mktsegment, c_nationkey, count(*) AS n,
      |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_bal
      |FROM customer
      |GROUP BY CUBE(c_mktsegment, c_nationkey)
      |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin

  /** §2.4 — exact percentiles (linear interpolation) per group. */
  def q50Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(percentile(col("l_quantity"), lit(0.5)), 4).as("p50"),
           round(percentile(col("l_quantity"), lit(0.9)), 4).as("p90"),
           count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val q50Sql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
      |  round(quantile_cont(l_quantity, 0.9), 4) AS p90,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** §2.8 JSON — real JSON parsing (`from_json` with a declared schema,
    * not the regex shortcut of q13), aggregated per type.
    */
  def q51FromJson(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("k", from_json(col("props"), lit("k INT")).getField("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"),
           count(col("k")).as("n_k"))
      .orderBy(col("event_type"))

  val q51Sql: String =
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
      |  count(CAST(json_extract(props, '$.k') AS INT)) AS n_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** ✚ as-of join — the operator Spark lacks natively, composed from
    * built-ins exactly as SURVEY §7.3 prescribes (option (a)): union
    * both sides tagged, one window pass carrying the last left-side
    * row forward, filter the right side. One shuffle on the key,
    * linear scan per partition — no quadratic range join. Here: the
    * last click at-or-before each purchase per user. The oracle is
    * DuckDB's native ASOF JOIN.
    */
  def q52AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("kind"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("kind"))
    // kind breaks ts ties so an equal-timestamp click sorts first
    // (ASOF's >= semantics)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, 0)
    clicks.unionByName(purchases)
      .withColumn("click_event",
        last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_ts",
        last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1 && col("click_event").isNotNull)
      .select(col("event_id").as("p_event"), col("user_id"),
              col("click_event"),
              (col("ts").cast("long") - col("click_ts").cast("long"))
                .as("gap_secs"))
      .orderBy(col("p_event"))
  }

  val q52Sql: String =
    """SELECT p.event_id AS p_event, p.user_id, c.event_id AS click_event,
      |  date_diff('second', c.ts, p.ts) AS gap_secs
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p_event""".stripMargin

  /** ✚ custom whole-operator plan: exact top-3 events by value per
    * user through [[graft.plans.TopK]] — a custom LogicalPlan +
    * SparkStrategy + two-stage SparkPlan with MAP-SIDE partial top-k,
    * so the shuffle carries ≤ k rows per key per partition instead of
    * the whole fact table (the window formulation can't pre-aggregate).
    * The oracle is the equivalent window query.
    */
  def q53TopKPerKey(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopK.topKPerKey(
        Tables(spark, dir, "events")
          .select(col("user_id"), col("event_id"), col("value")),
        Seq("user_id"), "value", k = 3, desc = true,
        tiebreak = Seq("event_id"))
      .orderBy(col("user_id"), col("value").desc, col("event_id"))

  val q53Sql: String =
    """SELECT user_id, event_id, value FROM (
      |  SELECT user_id, event_id, value,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY value DESC, event_id) AS rn
      |  FROM events) t
      |WHERE rn <= 3
      |ORDER BY user_id, value DESC, event_id""".stripMargin

  /** ✚ Z-order clustering key ([[graft.functions.ZOrderCode]]) over
    * lineitem's two independent join/filter dimensions — the Morton
    * code [[graft.ops.Compaction.compactClustered]] sorts by to get
    * row-group pruning on BOTH columns at 100 TB. The gate hashes the
    * code of every row (min/max plus a modular row sum per group, so a
    * single wrong bit in any row's code breaks the hash) and the
    * DuckDB oracle replays the interleave as the 31-term BIGINT
    * bit comprehension the expression's spec pins in JVM arithmetic.
    */
  def q118ZOrderKey(spark: SparkSession, dir: String): DataFrame = {
    val z = graft.functions.ZOrderCode.zorder(
      col("l_orderkey"), col("l_partkey"))
    Tables(spark, dir, "lineitem")
      .withColumn("z", z)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           min(col("z")).as("min_code"),
           max(col("z")).as("max_code"),
           sum(col("z") % lit(1000003L)).as("sum_code_mod"))
      .orderBy(col("l_returnflag"))
  }

  /** Morton spread in plain BIGINT arithmetic: bit i of `c` lands at
    * bit i*stride+`offset`. Generated terms — the SQL face of
    * [[graft.functions.ZOrderCode.spreadEvery]] (stride 2 replays the
    * binary [[graft.functions.ZOrderCode.spread]]).
    */
  private def spreadSql(c: String, offset: Int, stride: Int = 2): String =
    (0 until 62 / stride)
      .map(i => s"((($c >> $i) & 1) << ${i * stride + offset})")
      .mkString(" + ")

  val q118Sql: String = {
    val code = s"(${spreadSql("l_orderkey", 0)}) + " +
      s"(${spreadSql("l_partkey", 1)})"
    s"""SELECT l_returnflag, count(*) AS n,
       |  min($code) AS min_code,
       |  max($code) AS max_code,
       |  CAST(sum(($code) % 1000003) AS BIGINT) AS sum_code_mod
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  }

  /** ✚ N-dimensional Z-order ([[graft.functions.ZOrderCodeN]]) —
    * the 3-D Morton code of lineitem's three join keys, each folded
    * into the 62/3 = 20-bit per-dimension contract by `% 2^20` (keys
    * are dense per-SF — orderkey would overflow the 20-bit bound past
    * sf ≈ 0.7, so the gate normalizes explicitly and stays
    * SF-independent; ADVICE r15). Same hashing shape as q118 (min/max
    * + modular row sum per group); the oracle replays BOTH the fold
    * and the generic interleave as a generated 20-term-per-dimension
    * BIGINT comprehension at stride 3 — a wrong bit placement in ANY
    * row's code breaks the hash at both SFs.
    */
  def q120ZOrder3d(spark: SparkSession, dir: String): DataFrame = {
    val cells = lit(1L << 20)
    val z = graft.functions.ZOrderCode.zorder(
      col("l_orderkey") % cells, col("l_partkey") % cells,
      col("l_suppkey") % cells)
    Tables(spark, dir, "lineitem")
      .withColumn("z", z)
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           min(col("z")).as("min_code"),
           max(col("z")).as("max_code"),
           sum(col("z") % lit(1000003L)).as("sum_code_mod"))
      .orderBy(col("l_linestatus"))
  }

  val q120Sql: String = {
    val code = s"(${spreadSql("(l_orderkey % 1048576)", 0, 3)}) + " +
      s"(${spreadSql("(l_partkey % 1048576)", 1, 3)}) + " +
      s"(${spreadSql("(l_suppkey % 1048576)", 2, 3)})"
    s"""SELECT l_linestatus, count(*) AS n,
       |  min($code) AS min_code,
       |  max($code) AS max_code,
       |  CAST(sum(($code) % 1000003) AS BIGINT) AS sum_code_mod
       |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
  }
}
