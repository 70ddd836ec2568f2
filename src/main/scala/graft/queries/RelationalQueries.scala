package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops._
import graft.ops.ConditionFilter.{Eq, In, Pred}

/** Relational-core queries exercising the ops package (SURVEY.md §2.2,
  * §2.3, §2.4, §2.6, §2.7) — each paired with a DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]].
  */
object RelationalQueries {

  /** P1+P3 — condition-map filter + validated projection.
    * The whole predicate compiles to one Column tree → shows up as
    * PushedFilters on the parquet scan.
    */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame = {
    val filtered = ConditionFilter(
      Tables(spark, dir, "lineitem"),
      Map(
        "l_returnflag" -> Eq("A"),
        "l_quantity"   -> In((1 to 10).map(_.toDouble)),
        "l_shipdate"   -> Pred(_ <= lit("1996-12-31").cast("timestamp"))))
    Projections.project(
      filtered.withColumn("ship_date", to_date(col("l_shipdate"))),
      Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "ship_date"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val q2Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |  CAST(l_shipdate AS DATE) AS ship_date
      |FROM lineitem
      |WHERE l_returnflag = 'A'
      |  AND l_quantity IN (1,2,3,4,5,6,7,8,9,10)
      |  AND l_shipdate <= TIMESTAMP '1996-12-31'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** P2 — selector mini-language: regex / glob / substring selectors
    * compiled to one conjunctive predicate.
    */
  def q3Selector(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .filter(Selectors.predicate(Map(
        "p_type"  -> Selectors.parse("re:^(ECONOMY|SMALL)"),
        "p_name"  -> Selectors.parse("small *"),
        "p_brand" -> Selectors.parse("in:1"))))
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"))
      .orderBy(col("p_partkey"))

  val q3Sql: String =
    """SELECT p_partkey, p_name, p_brand, p_type
      |FROM part
      |WHERE regexp_matches(p_type, '^(ECONOMY|SMALL)')
      |  AND p_name LIKE 'small %'
      |  AND contains(p_brand, '1')
      |ORDER BY p_partkey""".stripMargin

  /** J1 — dimension enrichment: broadcast left join with name fallback
    * (`coalesce(label, own name)`), the reference's `_dict.txt` lookup.
    */
  def q4DimEnrich(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir, "customer")
    val nation = Tables(spark, dir, "nation")
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"), "left")
      .select(col("c_custkey"),
              coalesce(col("n_name"), col("c_name")).as("label"),
              col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q4Sql: String =
    """SELECT c_custkey, coalesce(n_name, c_name) AS label, c_mktsegment
      |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY c_custkey""".stripMargin

  /** J2/J4 — star-schema revenue rollup: fact-fact shuffle join on keys,
    * broadcast joins for the small dims. At 100 TB the lineitem⋈orders
    * join shuffles on orderkey; nation/region stay broadcast.
    */
  def q5RevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val ord = Tables(spark, dir, "orders")
    val cust = Tables(spark, dir, "customer")
    val nat = Tables(spark, dir, "nation")
    val reg = Tables(spark, dir, "region")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
             .cast("decimal(18,4)")), 2).cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q5Sql: String =
    """SELECT r_name, n_name,
      |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** A8/J3 — schema-evolving union: missing columns null-filled by name. */
  def q6UnionEvolve(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
      .filter(col("o_orderkey") < 100)
      .select(col("o_orderkey").as("id"),
              col("o_totalprice").as("amount"),
              lit("order").as("kind"))
    val cust = Tables(spark, dir, "customer")
      .filter(col("c_custkey") < 100)
      .select(col("c_custkey").as("id"),
              col("c_name").as("name"),
              lit("customer").as("kind"))
    Append.evolve(orders, cust).orderBy(col("kind"), col("id"))
  }

  val q6Sql: String =
    """SELECT * FROM (
      |  SELECT o_orderkey AS id, o_totalprice AS amount, 'order' AS kind
      |  FROM orders WHERE o_orderkey < 100
      |  UNION ALL BY NAME
      |  SELECT c_custkey AS id, c_name AS name, 'customer' AS kind
      |  FROM customer WHERE c_custkey < 100
      |) ORDER BY kind, id""".stripMargin

  /** A7 — hierarchical rollup (region → nation → grand total), the
    * signature subtree aggregation, one pass / one shuffle via `rollup`.
    */
  def q7Rollup(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val nat = Tables(spark, dir, "nation")
    val reg = Tables(spark, dir, "region")
    val joined = cust
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
    Grouping.subtreeRollup(joined, Seq("r_name", "n_name"),
        Seq(count(lit(1)).as("n_customers"),
            round(sum(col("c_acctbal")), 2).as("total_acctbal")))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  val q7Sql: String =
    """SELECT r_name, n_name, count(*) AS n_customers,
      |  round(sum(c_acctbal), 2) AS total_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  /** O3/O4 — top-k with deterministic tiebreak. */
  def q8TopK(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  val q8Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** A9 — distinct / count-distinct per group. */
  def q11Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
           count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  val q11Sql: String =
    """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
      |  count(*) AS n_customers
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** A4 — bucket accumulation: per-region sorted list of nation names
    * (serialized to CSV for a stable cross-engine representation).
    */
  def q12Buckets(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables(spark, dir, "nation")
    val reg = Tables(spark, dir, "region")
    val joined = nat.join(broadcast(reg),
      nat("n_regionkey") === reg("r_regionkey"))
    Grouping.buckets(joined, "r_name", "n_name")
      .withColumn("bucket_csv", array_join(col("bucket"), ","))
      .drop("bucket")
      .orderBy(col("r_name"))
  }

  val q12Sql: String =
    """SELECT r_name, count(*) AS n,
      |  array_to_string(list_sort(list(n_name)), ',') AS bucket_csv
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** J4 — anti join: customers with no high-value order (the filter on
    * the right side keeps the result non-empty at every SF, so the
    * oracle actually compares rows instead of passing on 0=0).
    */
  def q18AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders").filter(col("o_totalprice") > 300000)
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val q18Sql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  /** Set ops — intersect: nations present among both customers and
    * suppliers.
    */
  def q19Intersect(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val s = Tables(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    c.intersect(s).orderBy(col("nationkey"))
  }

  val q19Sql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  /** Set ops — except: customers who ordered, minus those with any
    * high-value order (non-empty at every SF so the oracle compares
    * real rows).
    */
  def q20Except(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders")
    val all = ord.select(col("o_custkey").as("custkey"))
    val big = ord.filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("custkey"))
    all.except(big).orderBy(col("custkey"))
  }

  val q20Sql: String =
    """SELECT o_custkey AS custkey FROM orders
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
      |ORDER BY custkey""".stripMargin

  /** J4 — semi join: customers that DO have a high-value order (row
    * set from the left side only; at scale the right side reduces to a
    * distinct-key shuffle, never widening the row).
    */
  def q44SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders").filter(col("o_totalprice") > 300000)
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q44Sql: String =
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  /** A2 — metadata-defaulted grouped read through the TableCatalog:
    * declared table_keys = (source, lang), filter on lang, so the group
    * keys INFER to (source) and the projection defaults to the declared
    * base columns — `get_data_from_database` end to end.
    */
  def q45CatalogRead(spark: SparkSession, dir: String): DataFrame = {
    val cat = new graft.catalog.TableCatalog(spark)
    cat.write("docs_cat", Tables(spark, dir, "documents"),
      graft.catalog.TableMeta(tableKeys = Seq("source", "lang"),
        baseColNames = Seq("n_chars")))
    cat.readGrouped("docs_cat",
        Map("lang" -> Eq("en")),
        Seq(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars")))
      .orderBy(col("source"))
  }

  val q45Sql: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents WHERE lang = 'en'
      |GROUP BY source ORDER BY source""".stripMargin

  /** A3 — per-source document summary via Summaries.perKeySummary. */
  def q17SourceSummary(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .withColumn("words", size(split(col("text"), " ")))
    Summaries.perKeySummary(docs, "source", "words", "n_chars")
      .orderBy(col("source"))
  }

  val q17Sql: String =
    """SELECT source, max(n_chars) AS max_chars,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_words,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars, count(*) AS n_records
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** A6 — section stats: per (returnflag, linestatus) min/max/mean and
    * half peak-to-peak of quantity — the blade-load stats shape.
    */
  def q22SectionStats(spark: SparkSession, dir: String): DataFrame =
    Summaries.sectionStats(Tables(spark, dir, "lineitem"),
        Seq("l_returnflag", "l_linestatus"), "l_quantity")
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q22Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS mean,
      |  round(max(l_quantity), 4) AS maximum,
      |  round(min(l_quantity), 4) AS minimum,
      |  round((round(max(l_quantity), 4) - round(min(l_quantity), 4)) / 2.0, 4) AS half_p2p
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** A1 — materialized group-split, oracle-gated: `Grouping.split`
    * collects only the distinct keys and hands back lazily-filtered
    * per-group views (`split_dataframe_by_groups`,
    * `df_helpers.py:80-123`); each view is aggregated independently
    * and the re-union must equal the oracle's plain GROUP BY.
    */
  def q64GroupSplit(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val parts = graft.ops.Grouping.split(orders, Seq("o_orderstatus"))
    parts.map { case (key, sub) =>
      sub.agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double").as("total_price"))
        .withColumn("o_orderstatus", lit(key("o_orderstatus").toString))
        .select(col("o_orderstatus"), col("n"), col("total_price"))
    }.reduce(_ unionByName _)
      .orderBy(col("o_orderstatus"))
  }

  val q64Sql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** P4 — literal + sequence prepend, oracle-gated: a driver-held
    * sequence joins by explicit rank order and a literal column lands
    * in front (`df_helpers.py:126-181` semantics: new columns first,
    * overwrite on collision). The oracle replays the rank as
    * row_number over the same total order.
    */
  def q77Prepend(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val seq = (1L to 25L).map(i => i * 100)
    val withSeq = graft.ops.Projections.prependSeq(
      nation, "seq_tag", seq, orderCols = Seq("n_nationkey"))
    graft.ops.Projections.prependLit(withSeq, Seq("batch" -> "b1"))
      .orderBy(col("n_nationkey"))
  }

  val q77Sql: String =
    """SELECT 'b1' AS batch,
      |  (row_number() OVER (ORDER BY n_nationkey)) * 100 AS seq_tag,
      |  n_nationkey, n_name, n_regionkey
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** A1 (partitioned-write form) — group-split as ONE `partitionBy`
    * write, oracle-gated: `Grouping.splitToDir` materializes every
    * group in a single distributed job (no per-key driver filters),
    * and reading ONE partition directory back must yield exactly that
    * group's rows — the gate aggregates the 'F' partition and compares
    * to the oracle's WHERE o_orderstatus = 'F'.
    */
  def q80SplitDir(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft_q80_").toString
    val out = root + "/split"
    val orders = Tables(spark, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
    val idx = graft.ops.Grouping.splitToDir(orders, Seq("o_orderstatus"), out)
    val fDir = idx.collectFirst {
      case (k, p) if k("o_orderstatus") == "F" => p
    }.getOrElse(sys.error("no 'F' partition written"))
    SourceQueries.materializeThenDelete(
      spark.read.parquet(fDir)
        .agg(count(lit(1)).as("n"),
             sum(col("o_orderkey")).as("key_sum"),
             round(sum(col("o_totalprice").cast("decimal(18,4)")), 2)
               .cast("double").as("total_price")),
      root)
  }

  val q80Sql: String =
    """SELECT count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
      |FROM orders WHERE o_orderstatus = 'F'""".stripMargin

  /** Bucketed co-located join, oracle-gated (the 100 TB repeated-join
    * layout): both sides are written bucketed+sorted on the join key,
    * and the join of the two TABLES must plan with ZERO shuffle
    * exchanges — asserted HERE, in the gated query itself, so the
    * scale strategy is hash-checked against the oracle every round,
    * not just plan-asserted in a spec. At 100 TB this layout turns
    * every repeated fact-fact join on the bucket key into a local
    * merge per bucket.
    */
  def q81BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Bucketing
    // a fresh in-memory catalog + a leftover warehouse dir from an
    // earlier session = LOCATION_ALREADY_EXISTS; clear both
    Seq("graft_q81_lineitem", "graft_q81_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + "/" + t)
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(loc, true)
    }
    Bucketing.writeBucketed(
      Tables(spark, dir, "lineitem").filter(col("l_orderkey") < 3000)
        .select(col("l_orderkey").as("orderkey"), col("l_quantity"),
          col("l_extendedprice")),
      "graft_q81_lineitem", numBuckets = 8, keys = Seq("orderkey"))
    Bucketing.writeBucketed(
      Tables(spark, dir, "orders").filter(col("o_orderkey") < 3000)
        .select(col("o_orderkey").as("orderkey"), col("o_orderstatus")),
      "graft_q81_orders", numBuckets = 8, keys = Seq("orderkey"))
    // pin the co-located SortMergeJoin for the WHOLE gated query:
    // with auto-broadcast on, the small side would broadcast (also
    // shuffle-free, but then the gate wouldn't exercise the bucketed
    // layout), and with AQE on the adaptive wrapper both hides the
    // join from tree assertions and may re-pick broadcast at runtime.
    // Asserting only a standalone join frame would be vacuous — the
    // aggregate built from it re-plans at action time — so the FULL
    // output plan (join + agg + sort) is forced inside the conf
    // window; queryExecution caches it, making the executed query
    // exactly the asserted one.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val gated = Bucketing.bucketedJoin(spark,
          "graft_q81_lineitem", "graft_q81_orders", Seq("orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
             sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("qty_sum"),
             round(sum(col("l_extendedprice").cast("decimal(18,4)")), 2)
               .cast("double").as("price_sum"))
        .orderBy(col("o_orderstatus"))
      // tree-level assertion on the plan that will actually run: the
      // join is a SortMergeJoin with ZERO shuffle exchanges in its
      // subtree (the agg/sort ABOVE it legitimately shuffle)
      val smjs = gated.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      require(smjs.nonEmpty,
        "bucketed join must plan as a SortMergeJoin — got:\n" +
          gated.queryExecution.executedPlan)
      smjs.foreach { j =>
        val shuffles = j.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        require(shuffles.isEmpty,
          "bucketed join subtree must be exchange-free — got:\n" + j)
      }
      gated
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  val q81Sql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty_sum,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS price_sum
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_orderkey < 3000 AND o_orderkey < 3000
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** J4/scale — adversarial skew-join gate: ~90% of lineitem rows are
    * forced onto ONE join key, and the join is routed through
    * [[graft.ops.Salting.saltedJoin]]. Without salting, every hot-key
    * row lands on a single reducer — the classic straggler; salting
    * splits the hot key across 8 salt buckets and replicates the
    * 25-row dim side per bucket.
    *
    * Like q81, the WHOLE gated query is planned inside a
    * broadcast-off/AQE-off conf window and tree-asserted: the join is
    * a SortMergeJoin and EVERY shuffle feeding it hash-partitions on
    * the salt column too — the plan-level guarantee that no partition
    * receives the whole hot key. The result itself is oracle-checked
    * against the plain (unsalted) relational join: salting must not
    * change a single row.
    */
  def q90SaltedSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Salting
    val big = Tables(spark, dir, "lineitem").select(
      when(col("l_partkey") % 10 < 9, lit(7L))
        .otherwise(col("l_partkey") % 25).cast("long").as("key"),
      col("l_quantity"))
    val small = Tables(spark, dir, "nation").select(
      col("n_nationkey").cast("long").as("key"), col("n_name").as("label"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val gated = Salting.saltedJoin(big, small, "key", buckets = 8)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity").cast("decimal(18,4)")), 2)
            .cast("double").as("qty_sum"))
        .orderBy(col("label"))
      val smjs = gated.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      require(smjs.nonEmpty,
        "salted join must plan as a SortMergeJoin — got:\n" +
          gated.queryExecution.executedPlan)
      smjs.foreach { j =>
        val parts = j.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            e.outputPartitioning
        }
        require(parts.nonEmpty, "salted join sides must shuffle — got:\n" + j)
        parts.foreach {
          case hp: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
            // resolve the salt as an attribute, not via toString — the
            // pretty-printed form (qualifiers, exprId suffixes) is not
            // a stable contract across Spark versions
            val saltAttr = hp.expressions.exists(_.collectFirst {
              case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
                  if a.name == "__salt" => a
            }.isDefined)
            require(saltAttr,
              "join-side shuffle must partition on the salt (hot key split " +
                "across buckets) — got: " + hp)
          case p =>
            throw new IllegalStateException(
              "expected hash partitioning under the salted join, got: " + p)
        }
      }
      gated
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  val q90Sql: String =
    """WITH big AS (
      |  SELECT CASE WHEN l_partkey % 10 < 9 THEN 7
      |              ELSE l_partkey % 25 END AS key,
      |         l_quantity
      |  FROM lineitem)
      |SELECT n_name AS label, count(*) AS n,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty_sum
      |FROM big JOIN nation ON n_nationkey = key
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** §2.2 nested paths — flatten/unflatten oracle gate
    * (`utils/nested_dicts.py:121-226` round-trip semantics on
    * `StructType` columns). The fixture builds a two-level struct over
    * `orders`, flattens it to dot-named leaf columns, regroups it with
    * unflatten, and aggregates the SAME rollup from both frames:
    *
    *  - the flat-side aggregate groups on the literal dotted column
    *    (backtick-quoted `info.status`) — it only binds if flatten
    *    produced exactly those leaf names;
    *  - the round-trip-side aggregate navigates the rebuilt structs
    *    (`info.meta.price`) — it only binds if unflatten regrouped the
    *    dot paths into the original shape;
    *  - both aggregates land in one row per status and must equal the
    *    oracle's direct rollup, so a value corrupted anywhere in the
    *    round trip breaks the hash;
    *  - `leaf_paths` pins the exact depth-first leaf-path contract as
    *    a literal.
    *
    * Pure projections both ways — codegen'd, no shuffle until the
    * final rollup, and column pruning still reaches the parquet scan.
    */
  def q103NestedPaths(spark: SparkSession, dir: String): DataFrame = {
    val nested = Tables(spark, dir, "orders").select(
      col("o_orderkey"),
      struct(
        struct(col("o_orderdate").as("date"),
          col("o_totalprice").as("price")).as("meta"),
        col("o_orderstatus").as("status")).as("info"))
    val flat = NestedPaths.flatten(nested)
    val pathsLit = flat.columns.mkString("|")
    val fromFlat = flat
      .groupBy(col("`info.status`").as("status"))
      .agg(count(lit(1)).as("n_flat"),
        round(sum(col("`info.meta.price`").cast("decimal(18,4)")), 2)
          .cast("double").as("price_flat"))
    val rt = NestedPaths.unflatten(flat)
    val fromRt = rt
      .groupBy(col("info.status").as("status"))
      .agg(count(lit(1)).as("n_rt"),
        round(sum(col("info.meta.price").cast("decimal(18,4)")), 2)
          .cast("double").as("price_rt"),
        min(col("info.meta.date")).cast("date").cast("string").as("first_date"),
        max(col("o_orderkey")).as("max_key"))
    fromFlat.join(fromRt, Seq("status"))
      .withColumn("leaf_paths", lit(pathsLit))
      .orderBy(col("status"))
  }

  val q103Sql: String =
    """SELECT o_orderstatus AS status,
      |  count(*) AS n_flat,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS price_flat,
      |  count(*) AS n_rt,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS price_rt,
      |  CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) AS first_date,
      |  max(o_orderkey) AS max_key,
      |  'o_orderkey|info.meta.date|info.meta.price|info.status' AS leaf_paths
      |FROM orders GROUP BY o_orderstatus ORDER BY status""".stripMargin
}
