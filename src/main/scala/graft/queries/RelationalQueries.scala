package graft.queries

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage over the TPC-H-ish tables (TESTDATA.md):
  * scan/project/filter, hash & broadcast joins, semi/anti joins, partial
  * aggregation, distinct, windows, sort/limit, set ops, date and JSON
  * functions, sessionization.
  *
  * Float policy: monetary sums go through DECIMAL(18,2) on both engines
  * (exact, so hashes match bit-for-bit); pass-through doubles are emitted
  * raw (both engines read identical parquet bits); computed doubles are
  * rounded well above the accumulation-order noise floor (SURVEY.md §7.4).
  */
object RelationalQueries {

  /** Exact money sum: decimal accumulation, double on the wire. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
          .cast("double").as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count("*").as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  def revenueBySegment(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(broadcast(Tables.customer(spark, sfDir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count("*").as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment")

  def supplierByRegion(spark: SparkSession, sfDir: String): DataFrame =
    Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count("*").as("n_suppliers"), dsum(col("s_acctbal")).as("acctbal"))
      .orderBy("r_name")

  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")

  def topOrdersPerCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
      .select(col("o_custkey"), col("rank").cast("long").as("rank"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rank")
  }

  def monthlyRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count("*").as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy("month")

  def topOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")

  /** Set ops: nations that have customers but no suppliers (EXCEPT) and
    * nations with both (INTERSECT), tagged and unioned. */
  def nationSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val custNations = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").as("nationkey"))
    val suppNations = Tables.supplier(spark, sfDir)
      .select(col("s_nationkey").as("nationkey"))
    custNations.intersect(suppNations)
      .withColumn("tag", lit("both"))
      .unionByName(custNations.except(suppNations)
        .withColumn("tag", lit("cust_only")))
      .orderBy("tag", "nationkey")
  }

  def distinctStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).agg(
      countDistinct(col("l_partkey")).as("d_parts"),
      countDistinct(col("l_suppkey")).as("d_supps"),
      countDistinct(col("l_orderkey")).as("d_orders"),
      count("*").as("n_rows"))

  def eventsJson(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count("*").as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** Sessionization: a new session starts after a >30 min gap per user;
    * classic lag + cumulative-sum-of-boundaries pattern (one shuffle,
    * keyed by user). */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"),
      col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("gap",
        unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(byUser)))
      .withColumn("new_session",
        when(col("gap").isNull || col("gap") > 1800, 1).otherwise(0))
      .groupBy("user_id")
      .agg(sum("new_session").as("n_sessions"), count("*").as("n_events"))
      .orderBy("user_id")
  }

  def hourlyEvents(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm").as("hour"), col("event_type"))
      .agg(count("*").as("n"), round(sum("value"), 4).as("sum_value"))
      .orderBy("hour", "event_type")

  /** Rollup (grouping sets) over region/nation supplier counts.
    * Grouping columns are passed as Column refs straight off the join —
    * aliasing them first and calling rollup(byName) trips Spark's
    * ambiguous-self-join detection on the Expand duplicates.
    */
  def rollupSuppliers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .rollup(col("n_regionkey"), col("n_name"))
      .agg(count("*").as("n_suppliers"))
      .select(
        coalesce(col("n_regionkey").cast("string"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_suppliers"))
      .orderBy("region", "nation")

  /** CUBE over (segment, nation-of-customer) order counts — all four
    * grouping sets in one pass. */
  def cubeOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(broadcast(Tables.customer(spark, sfDir)),
        col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("c_nationkey"))
      .agg(count("*").as("n_orders"))
      .select(
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        coalesce(col("c_nationkey").cast("string"), lit("ALL")).as("nation"),
        col("n_orders"))
      .orderBy("segment", "nation")

  /** Window-function battery beyond row_number: rank, dense_rank, lag,
    * lead, running sum — per-customer order timelines (top-3 customers
    * by key to keep output compact).
    */
  def windowFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .filter(col("o_custkey") <= 3)
      .withColumn("seq", row_number().over(w))
      .withColumn("price_rank", rank().over(wPrice))
      .withColumn("price_dense", dense_rank().over(wPrice))
      .withColumn("prev_price", lag("o_totalprice", 1).over(w))
      .withColumn("next_key", lead("o_orderkey", 1).over(w))
      .withColumn("run_spend",
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .select(col("o_custkey"), col("seq").cast("long").as("seq"),
        col("o_orderkey"), col("o_totalprice"),
        col("price_rank").cast("long").as("price_rank"),
        col("price_dense").cast("long").as("price_dense"),
        col("prev_price"), col("next_key"), col("run_spend"))
      .orderBy("o_custkey", "seq")
  }

  /** Left-semi join: customers with at least one open order — the
    * existence-check shape of the reference's IN-list lookup (O13). */
  def openOrderCustomers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count("*").as("n_customers"), dsum(col("c_acctbal")).as("acctbal"))
      .orderBy("c_mktsegment")

  /** Large-large equi-join (lineitem ⋈ orders): the shuffle-join shape —
    * both sides exceed the broadcast threshold at scale, so Catalyst
    * plans a shuffled join keyed on orderkey; AQE sizes the exchanges.
    */
  def revenueByPriority(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count("*").as("n_lineitems"),
        sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
          .cast("double").as("revenue"))
      .orderBy("o_orderpriority")

  /** As-of join: each click event enriched with the most recent view
    * event's value at-or-before it, per user. Right side pre-aggregated
    * to one row per (user, ts) so tie-breaks are deterministic on both
    * engines.
    */
  def asOfEnrichment(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(max("value").as("view_value"))
    graft.operators.AsOf.asOfJoin(clicks, views,
        "user_id", "ts", "ts", Seq("view_value"))
      .select(col("event_id"), col("user_id"),
        round(col("value"), 4).as("value"),
        round(col("view_value"), 4).as("view_value"))
      .orderBy("event_id")
  }

  /** Bucketed range join ([[graft.operators.RangeJoin]]): lineitems
    * shipped inside 30-day "promo windows" opened by the 20 priciest
    * orders. A naive BETWEEN theta join is a nested-loop cross; the
    * bucketed formulation is an equi-join on window-sized buckets —
    * exactly-once per qualifying pair, shuffle keyed on bucket id.
    */
  def rangeJoinPromos(spark: SparkSession, sfDir: String): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val ships = Tables.lineitem(spark, sfDir)
      .select(datediff(col("l_shipdate"), epoch).as("ship_day"),
        col("l_quantity"))
    val promos = Tables.orders(spark, sfDir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey").as("promo_id"),
        datediff(col("o_orderdate"), epoch).as("lo"))
      .withColumn("hi", col("lo") + 30)
    graft.operators.RangeJoin
      .pointInInterval(ships, promos, "ship_day", "lo", "hi",
        bucketWidth = 30L)
      .groupBy("promo_id")
      .agg(count("*").as("n_shipped"),
        round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("promo_id")
  }

  /** Heavy hitters: the [[graft.operators.Skew.keyHistogram]] pre-flight
    * that sizes a salting factor, as an oracle-checked query — top-20
    * event users by frequency, deterministic tie-break on key.
    */
  def heavyHitters(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Skew
      .keyHistogram(Tables.events(spark, sfDir), "user_id", topN = 20)

  /** Exact interpolated percentiles of lineitem quantity per return
    * flag — Spark's `percentile` and DuckDB's `quantile_cont` share the
    * p·(n−1) linear-interpolation definition, so values hash-match.
    * (The approximate twin at 100 TB is `approx_percentile`, one pass,
    * mergeable sketch; exact percentile shuffles each group's values.)
    */
  def percentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 6).as("p75"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"))
      .orderBy("l_returnflag")

  /** Forward as-of: every click enriched with the NEXT view at-or-after
    * it per user ([[graft.operators.AsOf.asOfJoinForward]]) — the
    * "what happened next" mirror of r18.
    */
  def asOfForward(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(max("value").as("next_view_value"))
    graft.operators.AsOf.asOfJoinForward(clicks, views,
        "user_id", "ts", "ts", Seq("next_view_value"))
      .select(col("event_id"), col("user_id"),
        round(col("value"), 4).as("value"),
        round(col("next_view_value"), 4).as("next_view_value"))
      .orderBy("event_id")
  }

  /** The window functions r15 leaves out: distribution ranks (ntile,
    * percent_rank, cume_dist) and explicit frames (running first_value,
    * 3-row moving max) — completing the window battery.
    */
  def windowFrames(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .filter(col("o_custkey") <= 3)
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("first_price", first("o_totalprice")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("max3", max("o_totalprice")
        .over(w.rowsBetween(-2, Window.currentRow)))
      .select(col("o_custkey"), col("o_orderkey"),
        col("quartile").cast("long").as("quartile"),
        round(col("pct_rank"), 6).as("pct_rank"),
        round(col("cume"), 6).as("cume"),
        col("first_price"), col("max3"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Correlated subqueries, written as literal SQL so Catalyst's
    * decorrelation does the rewrite: the scalar subquery (per-nation
    * average balance) becomes an aggregate + join, the EXISTS becomes a
    * left-semi join — no per-row re-execution anywhere in the physical
    * plan. At 100 TB both decorrelated joins shuffle once on their keys;
    * the naive nested-loop interpretation would be O(rows × subquery).
    */
  def existsSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("g_customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("g_orders")
    spark.sql(
      """SELECT c_custkey, c_nationkey, c_acctbal
        |FROM g_customer c
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM g_customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |  AND EXISTS (SELECT 1 FROM g_orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Pivot: order counts and exact revenue per year × order status,
    * statuses as columns. A pivot with an EXPLICIT value list is one
    * map-side conditional aggregation (no second pass to discover
    * pivot values, no extra shuffle) — always enumerate the values at
    * 100 TB.
    */
  def pivotOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .withColumn("year", year(col("o_orderdate")))
      .groupBy("year")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      // count(1), not count(*): star expansion is invalid inside a pivot
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("rev"))
      .select(col("year"),
        coalesce(col("F_n"), lit(0L)).as("n_f"),
        coalesce(col("F_rev"), lit(0.0)).as("rev_f"),
        coalesce(col("O_n"), lit(0L)).as("n_o"),
        coalesce(col("O_rev"), lit(0.0)).as("rev_o"),
        coalesce(col("P_n"), lit(0L)).as("n_p"),
        coalesce(col("P_rev"), lit(0.0)).as("rev_p"))
      .orderBy("year")

  /** Skew-salted join as an oracle-checked query: events (big, skewed
    * key space) joined to the customer dim through
    * [[graft.operators.Skew.saltedJoin]] — the salt fans each hot key
    * over 8 reducers, and the oracle pins that the result EQUALS the
    * plain join (salting changes shuffle layout, never semantics).
    */
  def saltedJoinSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(col("user_id"), col("value"))
    val dim = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    graft.operators.Skew.saltedJoin(ev, dim, "user_id", salts = 8)
      .groupBy("c_mktsegment")
      .agg(count("*").as("n"), round(sum("value"), 4).as("sum_value"))
      .orderBy("c_mktsegment")
  }

  /** Full outer join — the one join type r01-r26 leave uncovered. The
    * two sides are filtered to OVERLAPPING but distinct key ranges so
    * left-only, right-only and matched rows all occur; nulls from the
    * outer sides are coalesced into the output (count 0). At scale a
    * full outer cannot broadcast either side (both must be preserved)
    * — it is always a shuffled sort-merge join on the key, which is
    * exactly what the plan does here.
    */
  def fullOuterNations(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
      .filter(col("c_nationkey") < 20)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, sfDir)
      .filter(col("s_nationkey") >= 5)
      .groupBy("s_nationkey").agg(count(lit(1)).as("n_supp"))
    c.join(s, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  /** Explicit GROUPING SETS — the grouping API r13 (rollup) and r14
    * (cube) don't cover: two independent one-dimension breakdowns plus
    * the grand total in ONE pass over customer (a cube would add the
    * unwanted 2-D set). Same single Expand+aggregate plan shape as
    * rollup/cube: rows duplicate per set, one shuffle.
    */
  def groupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("g_customer")
    spark.sql(
      """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
        |       coalesce(CAST(c_nationkey AS STRING), 'ALL') AS nation,
        |       count(*) AS n_customers,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         AS acctbal
        |FROM g_customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        |ORDER BY segment, nation""".stripMargin)
  }

  /** Time-RANGE window frame — the frame type r22's ROWS battery leaves
    * out: per customer, the rolling 30-day order count and exact spend
    * ending at each order. RANGE frames bound by VALUE distance (here
    * epoch-day), so ties in order date share one frame regardless of row
    * order — the semantics ROWS frames cannot express.
    */
  def rangeFrameSpend(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("order_day"))
      .rangeBetween(-30, 0)
    Tables.orders(spark, sfDir)
      .filter(col("o_custkey") <= 5)
      .withColumn("order_day",
        datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"), col("order_day"),
        count(lit(1)).over(w).as("n_30d"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("spend_30d"))
      .orderBy("o_custkey", "order_day", "o_orderkey")
  }

  /** Unpivot (wide → long melt): the four lineitem measures as
    * (measure, value) rows, then totals per measure. Spark's `unpivot`
    * is a single Expand projection — rows fan out map-side, one shuffle
    * for the aggregate, never a join or a union of N scans (the naive
    * melt re-reads the table once per measure; the oracle is written
    * that way and must still match).
    */
  def unpivotMeasures(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        col("l_quantity").cast("decimal(18,2)").as("quantity"),
        col("l_extendedprice").cast("decimal(18,2)").as("extendedprice"),
        col("l_discount").cast("decimal(18,2)").as("discount"),
        col("l_tax").cast("decimal(18,2)").as("tax"))
      .unpivot(
        Array(col("l_orderkey")),
        Array(col("quantity"), col("extendedprice"), col("discount"),
          col("tax")),
        "measure", "value")
      .groupBy("measure")
      .agg(count(lit(1)).as("n"), sum("value").cast("double").as("total"))
      .orderBy("measure")

  /** Bloom-prefiltered join ([[graft.operators.Prefilter]]): lineitem
    * rows are dropped by a compact sketch of the urgent-order keys
    * BEFORE the join, and the exact join then removes the sketch's
    * false positives — so the oracle is the PLAIN join, pinning that
    * the prefilter never loses a true match. The runtime-filter shape
    * for shuffled joins whose dim side exceeds the broadcast threshold.
    */
  def bloomJoinUrgent(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    val prefiltered = graft.operators.Prefilter.bloomSemiFilter(
      Tables.lineitem(spark, sfDir), dim, "l_orderkey", "o_orderkey",
      expectedKeys = 100000L, fpp = 0.01)
    prefiltered.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"),
        dsum(col("l_extendedprice")).as("sum_price"),
        sum("l_orderkey").as("sum_keys"))
  }

  /** INTERSECT ALL / EXCEPT ALL — bag (multiset) set ops, where r08's
    * set-semantics battery keeps only distinct rows: multiplicities are
    * min(a,b) for intersect and a−b for except. Catalyst plans both as
    * one aggregate (per-side counts) + generate — a single shuffle on
    * the value, no join of the raw sides.
    */
  def bagSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val a = li.filter(col("l_returnflag") === "R").select("l_suppkey")
    val b = li.filter(col("l_quantity") > 25).select("l_suppkey")
    a.intersectAll(b).groupBy("l_suppkey").agg(count(lit(1)).as("n"))
      .withColumn("op", lit("intersect_all"))
      .unionByName(
        a.exceptAll(b).groupBy("l_suppkey").agg(count(lit(1)).as("n"))
          .withColumn("op", lit("except_all")))
      .select("op", "l_suppkey", "n")
      .orderBy("op", "l_suppkey")
  }

  /** TPC-H Q8-shaped market share: of all lineitem revenue ordered by
    * ASIA-region customers, the fraction supplied from NATION_7, per
    * order year. The widest join tree in the battery (lineitem ⨝ orders
    * ⨝ customer ⨝ nation ⨝ region ⨝ supplier ⨝ nation): the one
    * genuinely large-large join (lineitem⨝orders) shuffles on the
    * orderkey; every dimension hop is a broadcast hash join — the mixed
    * plan 100 TB star queries need (broadcasting orders instead would
    * OOM; shuffling nation would be absurd). Numerator and denominator
    * come out of ONE pass via conditional aggregation.
    */
  def marketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val nat = Tables.nation(spark, sfDir)
    val asiaCustomers = Tables.customer(spark, sfDir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)
          .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val suppNation = Tables.supplier(spark, sfDir)
      .join(broadcast(nat.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val volume = (col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(Tables.orders(spark, sfDir)
          .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(asiaCustomers), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .withColumn("volume", volume)
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        round(
          sum(when(col("supp_nation") === "NATION_7", col("volume"))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
            sum(col("volume")).cast("double"),
          6).as("mkt_share"),
        sum(col("volume")).cast("double").as("total_volume"))
      .orderBy("o_year")
  }

  /** LOCF gap-fill (last observation carried forward): every event row
    * annotated with the user's most recent purchase value — `last(...,
    * ignoreNulls)` over a running frame, the IGNORE NULLS window
    * feature r22's battery doesn't touch and the standard forward-fill
    * for sparse signals in event streams. One shuffle keyed by user;
    * the frame is running-state, O(1) per row.
    */
  def locfGapFill(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .filter(col("user_id") <= 20)
      .withColumn("purchase_value",
        when(col("event_type") === "purchase", round(col("value"), 4)))
      .select(col("user_id"), col("event_id"),
        last(col("purchase_value"), ignoreNulls = true).over(w)
          .as("last_purchase_value"))
      .orderBy("user_id", "event_id")
  }

  /** Recursive CTE (Spark 4's WITH RECURSIVE, executed as UnionLoop):
    * every customer walks its decimal-truncation ancestry chain
    * (c → c/10 → ... → 0 — an acyclic, strictly-decreasing hierarchy,
    * the org-chart/BOM traversal shape), aggregated per depth. Pure
    * SQL text on BOTH engines — Spark's recursive execution is pinned
    * against DuckDB's. Spark's recursion supports UNION ALL only
    * (UNION-distinct termination on cyclic graphs raises
    * UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE as of 4.1), so cyclic
    * closures stay on the iterative join+min-agg operator
    * ([[graft.operators.Graph.connectedComponents]], t16) — this query
    * covers the tree-walk half of the recursion story. Scale shape:
    * each iteration is one distributed self-transform; total rows =
    * |customers| × ~6 digits, linear.
    */
  def recursiveAncestors(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("graft_customer")
    spark.sql("""
      WITH RECURSIVE anc(custkey, anc_key, depth) AS (
        SELECT c_custkey, c_custkey, 0 FROM graft_customer
        UNION ALL
        SELECT custkey, anc_key DIV 10, depth + 1 FROM anc
        WHERE anc_key > 0)
      SELECT depth, count(*) AS n, sum(custkey) AS sum_keys,
             sum(anc_key) AS sum_ancs
      FROM anc GROUP BY depth ORDER BY depth""")
  }

  /** FastSS fuzzy entity resolution
    * ([[graft.operators.Dedup.fuzzyNameJoin]]): every distinct
    * part-name pair within Levenshtein distance 1, candidates blocked
    * by shared single-deletion variants, verified exactly. */
  def fuzzyPartNames(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.fuzzyNameJoin(Tables.part(spark, sfDir), "p_name")

  /** Sequential CONVERSION FUNNEL — the product-analytics primitive
    * (Amplitude/Mixpanel's core query): users reaching
    * view → click → purchase in strict temporal order, each stage's
    * first event strictly after the previous stage's. min-per-stage
    * conditional aggregates chained by time-bound semi-join-shaped
    * inner joins — one shuffle per stage keyed by user, no
    * sessionization state, no window over the raw event stream. At
    * 100 TB each stage frame is user-level (cardinality = users, not
    * events) and the joins are sort-merge on user_id; sum_uids pins
    * exact stage MEMBERSHIP, not just counts.
    */
  def conversionFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("tv"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("tv"))
      .groupBy("user_id").agg(min("ts").as("tc"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("tc"))
      .groupBy("user_id").agg(min("ts").as("tp"))
    def leg(df: DataFrame, stage: String) =
      df.agg(count(lit(1)).as("n_users"), sum("user_id").as("sum_uids"))
        .select(lit(stage).as("stage"), col("n_users"), col("sum_uids"))
    leg(v, "1_view").unionByName(leg(c, "2_click"))
      .unionByName(leg(p, "3_purchase"))
      .orderBy("stage")
  }

  /** COHORT RETENTION — the second product-analytics staple: users
    * grouped by first-seen week (ISO Monday truncation, identical in
    * both engines), per (cohort, week-offset) distinct-active counts
    * and the retention fraction against the cohort's size. Day-diff
    * div 7 (both week starts are Monday-aligned, so the difference is
    * always a multiple of 7) keeps the offset arithmetic exact and
    * engine-portable. Two user-level aggregates + one equi-join —
    * event-scale data collapses to (user, week) distinct rows in the
    * first pass.
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(col("user_id"), col("ts"))
    val cohort = ev.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort"))
    val sizes = cohort.groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
    val active = ev
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    active.join(cohort, "user_id")
      .withColumn("week_offset",
        expr("cast(datediff(week, cohort) as bigint) div 7"))
      .groupBy("cohort", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(sizes, "cohort")
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        col("week_offset"), col("n_active"),
        round(col("n_active").cast("double") / col("n_cohort"), 6)
          .as("retention"))
      .orderBy("cohort", "week_offset")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r36_fuzzy_join" -> (fuzzyPartNames(_, _)),
    "r37_funnel" -> (conversionFunnel(_, _)),
    "r38_cohort_retention" -> (cohortRetention(_, _)),
    "r35_recursive_tree" -> (recursiveAncestors(_, _)),
    "r01_pricing_summary" -> (pricingSummary(_, _)),
    "r02_revenue_by_segment" -> (revenueBySegment(_, _)),
    "r03_supplier_by_region" -> (supplierByRegion(_, _)),
    "r04_customers_without_orders" -> (customersWithoutOrders(_, _)),
    "r05_top_orders_per_customer" -> (topOrdersPerCustomer(_, _)),
    "r06_monthly_revenue" -> (monthlyRevenue(_, _)),
    "r07_top_orders" -> (topOrders(_, _)),
    "r08_nation_setops" -> (nationSetOps(_, _)),
    "r09_distinct_stats" -> (distinctStats(_, _)),
    "r10_events_json" -> (eventsJson(_, _)),
    "r11_sessionize" -> (sessionize(_, _)),
    "r12_hourly_events" -> (hourlyEvents(_, _)),
    "r13_rollup_suppliers" -> (rollupSuppliers(_, _)),
    "r14_cube_orders" -> (cubeOrders(_, _)),
    "r15_window_funcs" -> (windowFuncs(_, _)),
    "r16_semi_join" -> (openOrderCustomers(_, _)),
    "r17_big_join" -> (revenueByPriority(_, _)),
    "r18_asof_join" -> (asOfEnrichment(_, _)),
    "r19_range_join" -> (rangeJoinPromos(_, _)),
    "r20_heavy_hitters" -> (heavyHitters(_, _)),
    "r21_percentiles" -> (percentiles(_, _)),
    "r22_window_frames" -> (windowFrames(_, _)),
    "r23_asof_forward" -> (asOfForward(_, _)),
    "r24_exists_subquery" -> (existsSubquery(_, _)),
    "r25_pivot_orders" -> (pivotOrders(_, _)),
    "r26_salted_join" -> (saltedJoinSegments(_, _)),
    "r27_full_outer" -> (fullOuterNations(_, _)),
    "r28_grouping_sets" -> (groupingSets(_, _)),
    "r29_range_frame" -> (rangeFrameSpend(_, _)),
    "r30_unpivot" -> (unpivotMeasures(_, _)),
    "r31_bloom_join" -> (bloomJoinUrgent(_, _)),
    "r32_bag_setops" -> (bagSetOps(_, _)),
    "r33_market_share" -> (marketShare(_, _)),
    "r34_locf_gapfill" -> (locfGapFill(_, _)))

  val oracles: Map[String, String] = Map(
    // strict-order funnel: each stage's min-ts is bounded below by the
    // previous stage's — mirror of conversionFunnel
    "r37_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS tv FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS tc
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS tp
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY 1)
        |SELECT * FROM (
        |  SELECT '1_view' AS stage, count(*) AS n_users,
        |         CAST(sum(user_id) AS BIGINT) AS sum_uids FROM v
        |  UNION ALL
        |  SELECT '2_click', count(*), CAST(sum(user_id) AS BIGINT) FROM c
        |  UNION ALL
        |  SELECT '3_purchase', count(*), CAST(sum(user_id) AS BIGINT)
        |  FROM p)
        |ORDER BY stage""".stripMargin,
    // ISO-Monday week cohorts; day-diff // 7 is exact (both ends are
    // week starts) — mirror of cohortRetention
    "r38_cohort_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE)
        |    AS cohort
        |  FROM events GROUP BY 1),
        |sizes AS (SELECT cohort, count(*) AS n_cohort
        |          FROM cohort GROUP BY 1),
        |active AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE)
        |    AS week
        |  FROM events),
        |j AS (
        |  SELECT a.user_id, c.cohort,
        |         date_diff('day', c.cohort, a.week) // 7 AS week_offset
        |  FROM active a JOIN cohort c USING (user_id)),
        |agg AS (
        |  SELECT cohort, week_offset, count(DISTINCT user_id) AS n_active
        |  FROM j GROUP BY 1, 2)
        |SELECT strftime(g.cohort, '%Y-%m-%d') AS cohort,
        |       CAST(g.week_offset AS BIGINT) AS week_offset, g.n_active,
        |       round(CAST(g.n_active AS DOUBLE) / s.n_cohort, 6)
        |         AS retention
        |FROM agg g JOIN sizes s USING (cohort)
        |ORDER BY cohort, week_offset""".stripMargin,
    // FastSS del-1 blocking + exact levenshtein verify — mirror of
    // Dedup.fuzzyNameJoin (candidates via shared deletion variants,
    // so the oracle replays the SAME candidate generator, not an
    // all-pairs scan)
    "r36_fuzzy_join" ->
      """WITH names AS (
        |  SELECT p_name AS name, count(*) AS n FROM part GROUP BY 1),
        |var AS (
        |  SELECT name, n, unnest(list_distinct(list_prepend(name,
        |    CASE WHEN len(name) >= 1 THEN
        |      list_transform(range(1, len(name) + 1),
        |        i -> substring(name, 1, i - 1) || substring(name, i + 1))
        |    ELSE CAST([] AS VARCHAR[]) END))) AS v
        |  FROM names),
        |cand AS (
        |  SELECT DISTINCT a.name AS name_a, b.name AS name_b,
        |         a.n AS n_a, b.n AS n_b
        |  FROM var a JOIN var b ON a.v = b.v
        |  WHERE a.name < b.name)
        |SELECT name_a, name_b,
        |       CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist,
        |       n_a, n_b
        |FROM cand WHERE levenshtein(name_a, name_b) <= 1
        |ORDER BY name_a, name_b""".stripMargin,
    // the identical recursion in DuckDB ('//' = integer division)
    "r35_recursive_tree" ->
      """WITH RECURSIVE anc(custkey, anc_key, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer
        |  UNION ALL
        |  SELECT custkey, anc_key // 10, depth + 1 FROM anc
        |  WHERE anc_key > 0)
        |SELECT depth, count(*) AS n,
        |       CAST(sum(custkey) AS BIGINT) AS sum_keys,
        |       CAST(sum(anc_key) AS BIGINT) AS sum_ancs
        |FROM anc GROUP BY depth ORDER BY depth""".stripMargin,
    "r34_locf_gapfill" ->
      """SELECT user_id, event_id,
        |  last_value(CASE WHEN event_type = 'purchase'
        |                  THEN round(value, 4) END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_purchase_value
        |FROM events WHERE user_id <= 20
        |ORDER BY user_id, event_id""".stripMargin,
    "r33_market_share" ->
      """WITH vol AS (
        |  SELECT year(o_orderdate) AS o_year,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) -
        |            CAST(l_discount AS DECIMAL(18,2))) AS volume,
        |         sn.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE r_name = 'ASIA')
        |SELECT o_year,
        |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume
        |                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |        CAST(sum(volume) AS DOUBLE), 6) AS mkt_share,
        |  CAST(sum(volume) AS DOUBLE) AS total_volume
        |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin,
    "r30_unpivot" ->
      """WITH m AS (
        |  SELECT 'discount' AS measure, CAST(l_discount AS DECIMAL(18,2)) AS v
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'extendedprice', CAST(l_extendedprice AS DECIMAL(18,2))
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'quantity', CAST(l_quantity AS DECIMAL(18,2)) FROM lineitem
        |  UNION ALL
        |  SELECT 'tax', CAST(l_tax AS DECIMAL(18,2)) FROM lineitem)
        |SELECT measure, count(*) AS n, CAST(sum(v) AS DOUBLE) AS total
        |FROM m GROUP BY measure ORDER BY measure""".stripMargin,
    "r31_bloom_join" ->
      """SELECT o_orderpriority, count(*) AS n_rows,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price,
        |       CAST(sum(l_orderkey) AS BIGINT) AS sum_keys
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderpriority""".stripMargin,
    "r32_bag_setops" ->
      """WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
        |b AS (SELECT l_suppkey FROM lineitem WHERE l_quantity > 25),
        |i AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
        |e AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |SELECT * FROM (
        |  SELECT 'intersect_all' AS op, l_suppkey, count(*) AS n
        |  FROM i GROUP BY l_suppkey
        |  UNION ALL
        |  SELECT 'except_all', l_suppkey, count(*) FROM e GROUP BY l_suppkey)
        |ORDER BY op, l_suppkey""".stripMargin,
    "r29_range_frame" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |         date_diff('day', DATE '1970-01-01', o_orderdate) AS order_day,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders WHERE o_custkey <= 5)
        |SELECT o_custkey, o_orderkey, order_day,
        |  count(*) OVER w AS n_30d,
        |  CAST(sum(price) OVER w AS DOUBLE) AS spend_30d
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY order_day
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, order_day, o_orderkey""".stripMargin,
    "r28_grouping_sets" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
        |       coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nation,
        |       count(*) AS n_customers,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         AS acctbal
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        |ORDER BY segment, nation""".stripMargin,
    "r27_full_outer" ->
      """WITH c AS (SELECT c_nationkey, count(*) AS n_cust FROM customer
        |           WHERE c_nationkey < 20 GROUP BY c_nationkey),
        |s AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier
        |      WHERE s_nationkey >= 5 GROUP BY s_nationkey)
        |SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
        |       coalesce(n_cust, 0) AS n_cust,
        |       coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,
    "r24_exists_subquery" ->
      """SELECT c_custkey, c_nationkey, c_acctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |  AND EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "r25_pivot_orders" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS year,
        |  count(*) FILTER (o_orderstatus = 'F') AS n_f,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'F'), 0) AS DOUBLE) AS rev_f,
        |  count(*) FILTER (o_orderstatus = 'O') AS n_o,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'O'), 0) AS DOUBLE) AS rev_o,
        |  count(*) FILTER (o_orderstatus = 'P') AS n_p,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'P'), 0) AS DOUBLE) AS rev_p
        |FROM orders GROUP BY year ORDER BY year""".stripMargin,
    "r26_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "r01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "r02_revenue_by_segment" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "r03_supplier_by_region" ->
      """SELECT r_name, count(*) AS n_suppliers,
        |  CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "r04_customers_without_orders" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "r05_top_orders_per_customer" ->
      """SELECT o_custkey, rank, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders) WHERE rank <= 2
        |ORDER BY o_custkey, rank""".stripMargin,
    "r06_monthly_revenue" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY month ORDER BY month""".stripMargin,
    "r07_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
        |ORDER BY o_orderkey""".stripMargin,
    "r08_nation_setops" ->
      """SELECT nationkey, 'both' AS tag FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT
        |  SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT nationkey, 'cust_only' AS tag FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT
        |  SELECT s_nationkey FROM supplier)
        |ORDER BY tag, nationkey""".stripMargin,
    "r09_distinct_stats" ->
      """SELECT count(DISTINCT l_partkey) AS d_parts,
        |       count(DISTINCT l_suppkey) AS d_supps,
        |       count(DISTINCT l_orderkey) AS d_orders,
        |       count(*) AS n_rows
        |FROM lineitem""".stripMargin,
    "r10_events_json" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "r11_sessionize" ->
      """WITH g AS (
        |  SELECT user_id,
        |         date_diff('second',
        |           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |           ts) AS gap
        |  FROM events)
        |SELECT user_id,
        |       CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "r12_hourly_events" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        |       event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin,
    "r14_cube_orders" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
        |       coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nation,
        |       count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE (c_mktsegment, c_nationkey)
        |ORDER BY segment, nation""".stripMargin,
    "r15_window_funcs" ->
      """SELECT o_custkey,
        |  CAST(row_number() OVER seq_w AS BIGINT) AS seq,
        |  o_orderkey, o_totalprice,
        |  CAST(rank() OVER price_w AS BIGINT) AS price_rank,
        |  CAST(dense_rank() OVER price_w AS BIGINT) AS price_dense,
        |  lag(o_totalprice, 1) OVER seq_w AS prev_price,
        |  lead(o_orderkey, 1) OVER seq_w AS next_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS run_spend
        |FROM orders
        |WHERE o_custkey <= 3
        |WINDOW
        |  seq_w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  price_w AS (PARTITION BY o_custkey
        |              ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, seq""".stripMargin,
    "r23_asof_forward" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, ts, max(value) AS next_view_value FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id, round(c.value, 4) AS value,
        |       round(v.next_view_value, 4) AS next_view_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts <= v.ts
        |ORDER BY c.event_id""".stripMargin,
    "r22_window_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  first_value(o_totalprice) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS first_price,
        |  max(o_totalprice) OVER
        |    (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS max3
        |FROM orders WHERE o_custkey <= 3
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "r20_heavy_hitters" ->
      """SELECT user_id, count(*) AS n FROM events
        |GROUP BY user_id ORDER BY n DESC, user_id LIMIT 20""".stripMargin,
    "r21_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 6) AS p75,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "r19_range_join" ->
      """WITH promos AS (
        |  SELECT o_orderkey AS promo_id,
        |         date_diff('day', DATE '1970-01-01', o_orderdate) AS lo,
        |         date_diff('day', DATE '1970-01-01', o_orderdate) + 30 AS hi
        |  FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20),
        |ships AS (
        |  SELECT date_diff('day', DATE '1970-01-01', l_shipdate) AS ship_day,
        |         l_quantity
        |  FROM lineitem)
        |SELECT promo_id, count(*) AS n_shipped,
        |       round(sum(l_quantity), 2) AS sum_qty
        |FROM promos p JOIN ships s ON s.ship_day BETWEEN p.lo AND p.hi
        |GROUP BY promo_id ORDER BY promo_id""".stripMargin,
    "r18_asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, ts, max(value) AS view_value FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id, round(c.value, 4) AS value,
        |       round(v.view_value, 4) AS view_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin,
    "r16_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "r17_big_join" ->
      """SELECT o_orderpriority, count(*) AS n_lineitems,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "r13_rollup_suppliers" ->
      """SELECT coalesce(CAST(n_regionkey AS VARCHAR), 'ALL') AS region,
        |       coalesce(n_name, 'ALL') AS nation,
        |       count(*) AS n_suppliers
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_regionkey, n_name)
        |ORDER BY region, nation""".stripMargin)
}
