package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** TPC-H-shaped relational suite over the star-schema fixtures —
  * demonstrates the full Spark SQL surface the engine inherits (joins incl.
  * broadcast/semi/anti, windows, rollup, set ops, scalar functions), each
  * hash-checked against DuckDB.
  *
  * Numeric convention (float-sum determinism): double measures are summed
  * as DECIMAL(18,4) — exact, order-independent, identical in both engines —
  * then cast back to DOUBLE for the output; averages are rounded to 6
  * decimals. Aggregates are cast to BIGINT where DuckDB would widen to
  * INT128.
  *
  * Scale notes (100 TB thinking, verified via .explain):
  *  - dimension joins (region/nation/supplier/customer) are broadcast;
  *  - fact-fact joins shuffle on the join key only after filters are
  *    pushed to the parquet scans;
  *  - windows partition by bounded keys (suppkey) — no global sort.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Exact sum of a double measure via DECIMAL(15,4), output as double.
    * Each FACTOR is cast to decimal before any multiplication (see [[rev]]):
    * rounding a double product to decimal differs between engines in the
    * last ULP, while per-column 2-dp fixture values convert identically. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(15,4)")).cast("double")

  /** revenue term: extendedprice × (1 − discount), decimal-exact. The
    * product of 2-dp factors has ≤4 decimals, so the narrowing cast is
    * exact; keeping the summed scale ≤6 keeps the final decimal→double
    * conversion identical across engines (mantissa fits 2^53). */
  private def revTerm = (col("l_extendedprice").cast("decimal(15,4)") *
    (lit(1) - col("l_discount")).cast("decimal(6,4)")).cast("decimal(18,4)")

  /** charge term: revenue × (1 + tax), decimal-exact (≤6 decimals). */
  private def chargeTerm = (revTerm *
    (lit(1) + col("l_tax")).cast("decimal(6,4)")).cast("decimal(20,6)")

  val queries: Map[String, Q] = Map(
    // TPC-H Q1: pricing summary report
    "q1_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(revTerm).cast("double").as("sum_disc_price"),
          sum(chargeTerm).cast("double").as("sum_charge"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q3-shaped: shipping priority (top 10 unshipped orders by value)
    "q3_shipping_priority" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders").filter(col("o_orderdate") < lit("1995-03-15"))
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1995-03-15"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum(revTerm).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-shaped: revenue by nation within one region
    "q5_local_supplier" -> ((s, dir) => {
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
      val supp = t(s, dir, "supplier")
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(revTerm).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    }),

    // TPC-H Q7-shaped: shipping volume between two nations, by direction
    // and year — the fact table shuffles once on l_orderkey; everything
    // else broadcasts; decimal sums keep the aggregate order-free
    "q7_volume_shipping" -> ((s, dir) => {
      val pair = Seq("NATION_1", "NATION_2")
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        .filter(col("supp_nation").isin(pair: _*))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        .filter(col("cust_nation").isin(pair: _*))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(revTerm).cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q10-shaped: top customers by revenue lost to returned items
    "q10_returned_items" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(revTerm).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    }),

    // EXISTS: orders having a big-quantity lineitem (left semi)
    "join_semi" -> ((s, dir) => {
      val big = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // NOT EXISTS: customers with no orders (left anti)
    "join_anti" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // As-of join (DuckDB `ASOF JOIN` is native in the reference's host
    // engine): for each event, the latest "mark" record (every 7th id —
    // 7 is coprime to 4, so every key class has marks) with mark_id <=
    // event_id in the same key class. One key shuffle + one window — see
    // operators/Temporal.asofJoin.
    "join_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val l = ev.select(col("event_id"), (col("event_id") % 4).as("k"),
        col("event_id").as("t"))
      val r = ev.filter(col("event_id") % 7 === 0)
        .select((col("event_id") % 4).as("k"), col("event_id").as("mark_id"))
        .withColumn("mt", col("mark_id"))
      graft.operators.Temporal.asofJoin(l, r, Seq("k"), "t", "mt")
        .select("event_id", "k", "mark_id")
        .orderBy("event_id")
    }),

    // The skew-safe two-pass as-of (per-(key, time-bucket) windows +
    // bucket carry-in — no per-key partition ever holds more than a
    // bucket's rows). Identical semantics to join_asof, so it shares its
    // DuckDB ASOF JOIN oracle verbatim.
    "join_asof_skew" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val l = ev.select(col("event_id"), (col("event_id") % 4).as("k"),
        col("event_id").as("t"))
      val r = ev.filter(col("event_id") % 7 === 0)
        .select((col("event_id") % 4).as("k"), col("event_id").as("mark_id"))
        .withColumn("mt", col("mark_id"))
      graft.operators.Temporal.asofJoinBucketed(l, r, Seq("k"), "t", "mt",
        bucketWidth = 500.0)
        .select("event_id", "k", "mark_id")
        .orderBy("event_id")
    }),

    // As-of with a lookback tolerance (pandas merge_asof semantics): a
    // mark older than 10 below the event is stale → no match (inner
    // drops the row). Oracle = the argmax formulation in plain SQL.
    "join_asof_tol" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val l = ev.select(col("event_id"), (col("event_id") % 4).as("k"),
        col("event_id").as("t"))
      val r = ev.filter(col("event_id") % 7 === 0)
        .select((col("event_id") % 4).as("k"), col("event_id").as("mark_id"))
        .withColumn("mt", col("mark_id"))
      graft.operators.Temporal.asofJoin(l, r, Seq("k"), "t", "mt",
        tolerance = Some(10L))
        .select("event_id", "k", "mark_id")
        .orderBy("event_id")
    }),

    // Range join: lineitem quantities against overlapping quantity bands
    // (derived from nation so the band table is fixture-stable). Binned
    // equi-join — never the BroadcastNestedLoop all-pairs plan; see
    // operators/Temporal.rangeJoin.
    "join_range" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val bands = t(s, dir, "nation").select(
        col("n_nationkey").as("band_id"),
        (col("n_nationkey").cast("double") * 2).as("lo"),
        (col("n_nationkey").cast("double") * 2 + 3).as("hi"))
      graft.operators.Temporal.rangeJoin(li, "l_quantity", bands,
        "lo", "hi", binWidth = 4.0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "band_id")
        // quantity is in the sort: the fixture's (orderkey, linenumber)
        // is NOT unique, so ties would order engine-dependently
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "band_id")
    }),

    // Gap-based sessionization (batch analog of the streaming
    // session_window path): one key shuffle, two windows sharing one
    // sort — see operators/Sessions.sessionize. event_id is the dense
    // time axis; gap 100 yields multi-session users on the fixtures.
    "sessionize" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"), col("event_id"))
      graft.operators.Sessions.sessionSummary(ev, "user_id", "event_id",
        gap = 100L)
        .orderBy("user_id", "session_id")
    }),

    // Skew-safe two-phase (salted) aggregation — result must EQUAL the
    // plain groupBy (the oracle); decimal sums make the equality exact
    // under the salt's different addition order.
    "agg_salted_skew" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_quantity").cast("decimal(18,4)").as("qty"))
      graft.operators.Sessions.saltedSum(li, Seq("l_returnflag"), "qty",
        salt = 16)
        .select(col("l_returnflag"), col("sum_qty").cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // window: per-supplier running quantity in shipdate order
    "window_running_sum" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      t(s, dir, "lineitem").filter(col("l_suppkey") <= 3)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity").cast("decimal(18,4)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_qty"),
          row_number().over(w).as("rn"))
        .orderBy("l_suppkey", "rn")
    }),

    // window: top-3 orders by value per customer
    "window_topn" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rk"))
        .filter(col("rk") <= 3)
        .orderBy("o_custkey", "rk")
    }),

    // ROLLUP over returnflag/linestatus
    "agg_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // set op: nations with customers but no suppliers
    "set_except" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    // distinct aggregation
    "distinct_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    // scalar string functions
    "string_funcs" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type5"),
          concat_ws("|", col("p_brand"), col("p_type")).as("bt"))
        .orderBy("p_partkey")),

    // date functions: orders per month
    "date_funcs" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("int").as("y"),
          month(col("o_orderdate")).cast("int").as("m"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("monthly_value"))
        .orderBy("y", "m")),

    // CASE expression bucketing
    "case_expr" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 150000, "medium")
          .otherwise("large").as("band"))
        .groupBy("band").agg(count(lit(1)).as("n"))
        .orderBy("band")),

    // CUBE over returnflag/linestatus (all four grouping combinations)
    "agg_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // FULL OUTER: negative-balance customers vs their big-order counts —
    // unmatched rows surface on both sides
    "join_full_outer" -> ((s, dir) => {
      val poor = t(s, dir, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_custkey"), col("c_acctbal"))
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 180000)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_big"))
      poor.join(big, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_acctbal"), col("n_big"))
        .orderBy("custkey")
    }),

    // GROUPING SETS: two independent groupings in one pass (SQL-only
    // surface — the DataFrame API exposes rollup/cube; general sets go
    // through the parser)
    "agg_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          |CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) AS sum_qty
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    }),

    // scalar subquery: orders above the global average price. The average
    // is a decimal-exact sum over a broadcast one-row aggregate — the same
    // plan Catalyst produces for a scalar subquery, written explicitly.
    "scalar_subquery" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val avgP = ord.agg((dsum(col("o_totalprice")) /
        count(lit(1))).as("avg_price"))
      ord.crossJoin(broadcast(avgP))
        .filter(col("o_totalprice") > col("avg_price"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    })
  )

  private def dsumSql(x: String) =
    s"CAST(SUM(CAST($x AS DECIMAL(15,4))) AS DOUBLE)"

  private val revTermSql =
    "CAST(CAST(l_extendedprice AS DECIMAL(15,4)) * CAST(1 - l_discount AS DECIMAL(6,4)) AS DECIMAL(18,4))"
  private val chargeTermSql =
    s"CAST($revTermSql * CAST(1 + l_tax AS DECIMAL(6,4)) AS DECIMAL(20,6))"

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |${dsumSql("l_quantity")} AS sum_qty,
         |${dsumSql("l_extendedprice")} AS sum_base_price,
         |CAST(SUM($revTermSql) AS DOUBLE) AS sum_disc_price,
         |CAST(SUM($chargeTermSql) AS DOUBLE) AS sum_charge,
         |round(avg(l_quantity), 6) AS avg_qty,
         |round(avg(l_extendedprice), 6) AS avg_price,
         |round(avg(l_discount), 6) AS avg_disc,
         |CAST(count(*) AS BIGINT) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate,
         |CAST(SUM($revTermSql) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
         |AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |CAST(year(l_shipdate) AS INTEGER) AS l_year,
         |CAST(SUM($revTermSql) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
         |  AND n2.n_name IN ('NATION_1', 'NATION_2')
         |  AND n1.n_name != n2.n_name
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name,
         |CAST(SUM($revTermSql) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q5_local_supplier" ->
      s"""SELECT n_name, CAST(SUM($revTermSql) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "join_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_asof" ->
      """WITH l AS (SELECT event_id, event_id % 4 AS k FROM events),
        |m AS (SELECT event_id % 4 AS k, event_id AS mark_id FROM events
        |      WHERE event_id % 7 = 0)
        |SELECT l.event_id, l.k, m.mark_id
        |FROM l ASOF JOIN m ON l.k = m.k AND l.event_id >= m.mark_id
        |ORDER BY event_id""".stripMargin,
    "join_asof_skew" ->
      """WITH l AS (SELECT event_id, event_id % 4 AS k FROM events),
        |m AS (SELECT event_id % 4 AS k, event_id AS mark_id FROM events
        |      WHERE event_id % 7 = 0)
        |SELECT l.event_id, l.k, m.mark_id
        |FROM l ASOF JOIN m ON l.k = m.k AND l.event_id >= m.mark_id
        |ORDER BY event_id""".stripMargin,
    "join_asof_tol" ->
      """WITH l AS (SELECT event_id, event_id % 4 AS k FROM events),
        |m AS (SELECT event_id % 4 AS k, event_id AS mark_id FROM events
        |      WHERE event_id % 7 = 0)
        |SELECT l.event_id, l.k, MAX(m.mark_id) AS mark_id
        |FROM l JOIN m ON l.k = m.k
        |  AND m.mark_id <= l.event_id AND m.mark_id >= l.event_id - 10
        |GROUP BY l.event_id, l.k
        |ORDER BY event_id""".stripMargin,
    "join_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       n_nationkey AS band_id
        |FROM lineitem, nation
        |WHERE l_quantity >= n_nationkey * 2 AND l_quantity <= n_nationkey * 2 + 3
        |ORDER BY l_orderkey, l_linenumber, l_quantity, band_id""".stripMargin,
    "sessionize" ->
      """WITH b AS (
        |  SELECT user_id, event_id,
        |    CASE WHEN lag(event_id) OVER w IS NULL
        |         OR event_id - lag(event_id) OVER w > 100 THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |x AS (
        |  SELECT user_id, event_id,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM b)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       MIN(event_id) AS session_start, MAX(event_id) AS session_end
        |FROM x GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "agg_salted_skew" ->
      """SELECT l_returnflag,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "window_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
        |  OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
        |row_number() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        |FROM lineitem WHERE l_suppkey <= 3
        |ORDER BY l_suppkey, rn""".stripMargin,
    "window_topn" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,
    "agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
         |${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "distinct_agg" ->
      """SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u, CAST(length(p_name) AS INTEGER) AS name_len,
        |substr(p_type, 1, 5) AS type5, concat_ws('|', p_brand, p_type) AS bt
        |FROM part ORDER BY p_partkey""".stripMargin,
    "date_funcs" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
         |CAST(month(o_orderdate) AS INTEGER) AS m,
         |CAST(count(*) AS BIGINT) AS n, ${dsumSql("o_totalprice")} AS monthly_value
         |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin,
    "case_expr" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |WHEN o_totalprice < 150000 THEN 'medium' ELSE 'large' END AS band,
        |CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1 ORDER BY band""".stripMargin,
    "agg_cube" ->
      s"""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
         |${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "join_full_outer" ->
      """SELECT coalesce(c_custkey, o_custkey) AS custkey, c_acctbal, n_big
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < 0) c
        |FULL OUTER JOIN (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_big
        |                 FROM orders WHERE o_totalprice > 180000 GROUP BY 1) o
        |ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "agg_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
         |${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "scalar_subquery" ->
      s"""SELECT o_orderkey, o_totalprice FROM orders
         |WHERE o_totalprice > (SELECT ${dsumSql("o_totalprice")} / count(*) FROM orders)
         |ORDER BY o_orderkey""".stripMargin
  )
}
