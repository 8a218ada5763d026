package graft

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.Stage
import graft.io.{HdfsUrl, Warehouse, WarehouseTable}
import graft.ops.{Bpe, Dedup, Joins, Multimodal, Similarity, TextAnalysis, Web}
import graft.time.Day

/**
 * TPC-H query shapes + framework-surface queries (stages, warehouse,
 * sessions, windows, pivots) — SURVEY.md §2 Q1–Q36 area.
 *
 * One battery family of [[Queries]] — split out for maintainability; the
 * query set and every definition are unchanged.
 */
private[graft] trait QueriesTpch extends QueryHelpers { this: QueryBattery =>
  /** TPC-H Q1: one shuffle on a 2-value key, map-side partial agg. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val disc = lit(100L) - pct(col("l_discount"))
    val tax = lit(100L) + pct(col("l_tax"))
    t(dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(cents(col("l_extendedprice"))) / 100.0, 2).as("sum_base_price"),
        money2(sum(cents(col("l_extendedprice")) * disc)).as("sum_disc_price"),
        money2(sum(cents(col("l_extendedprice")) * disc * tax), perCent = 10000L).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(sum(cents(col("l_extendedprice"))) / 100.0 / count(lit(1)), 4).as("avg_price"),
        round(sum(pct(col("l_discount"))) / 100.0 / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1Sql: String = {
    val c = sqlCents("l_extendedprice")
    val d = s"(100 - ${sqlCents("l_discount")})"
    val x = s"(100 + ${sqlCents("l_tax")})"
    s"""SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       round(cast(sum($c) as bigint) / 100.0, 2) AS sum_base_price,
       ${sqlMoney2(s"cast(sum($c * $d) as bigint)")} AS sum_disc_price,
       ${sqlMoney2(s"cast(sum($c * $d * $x) as bigint)", perCent = 10000L)} AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(cast(sum($c) as bigint) / 100.0 / count(*), 4) AS avg_price,
       round(cast(sum(${sqlCents("l_discount")}) as bigint) / 100.0 / count(*), 4) AS avg_disc,
       count(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus"""
  }

  /** TPC-H Q3: broadcast the filtered dims, shuffle only on l_orderkey. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val cust = t(dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(dir, "orders").filter(col("o_orderdate") < lit("1998-01-01"))
    val li = t(dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01"))
    li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(money2(sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))))
        .as("revenue"))
      .select(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String = {
    val rev = s"${sqlMoney2(s"cast(sum(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})) as bigint)")}"
    s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, revenue FROM (
       SELECT l_orderkey, o_orderdate, $rev AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
         AND l_shipdate > TIMESTAMP '1998-01-01'
       GROUP BY l_orderkey, o_orderdate)
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""
  }

  /** TPC-H Q5: four broadcast dims, one shuffle join on orderkey. */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val dims = broadcast(
      t(dir, "customer")
        .join(broadcast(t(dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(dir, "region")).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey")))
    t(dir, "lineitem")
      .join(broadcast(t(dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(t(dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(dims, col("o_custkey") === col("c_custkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(money2(sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))))
        .as("revenue"))
  }

  val q5Sql: String =
    s"""SELECT n_name,
       ${sqlMoney2(s"cast(sum(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})) as bigint)")} AS revenue
       FROM lineitem
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
       GROUP BY n_name"""

  /** Window function: single shuffle on o_custkey. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(dir, "orders")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rank"))
  }

  val topOrdersSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
       SELECT o_custkey, o_orderkey, o_totalprice,
              row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
       FROM orders) WHERE rank <= 3"""

  /** Partial distinct map-side before the shuffle. */
  def distinctEventTypes(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    events(dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"))
  }

  val distinctEventTypesSql: String =
    "SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n FROM events GROUP BY event_type"

  /** Date-truncated rollup; partition-prunable at scale by the day key. */
  def eventsDailyRollup(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    events(dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
  }

  val eventsDailyRollupSql: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n,
       round(sum(value), 4) AS total_value
       FROM events GROUP BY 1, 2"""

  /**
   * DateInterval-driven predicate, pushed to the parquet scan. When `ts` is
   * raw nanos (see [[events]]), the bound is compared in the nanos domain so
   * the predicate stays pushable — filtering on `timestamp_micros(ts DIV
   * 1000)` would wrap the column in an expression and reduce the scan to
   * `IsNotNull`, a full scan at 100 TB.
   */
  def dateFilter(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val interval = Day(2024, 1, 10) to Day(2024, 1, 20)
    val raw = t(dir, "events")
    val filtered = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.filter(col("ts") >= lit(interval.from * 1000000L) &&
          col("ts") < lit(interval.end.from * 1000000L))
      case _ =>
        raw.filter(col("ts") >= lit(interval.start.toString) &&
          col("ts") < lit(interval.end.start.toString))
    }
    filtered
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
  }

  val dateFilterSql: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 4) AS total_value
       FROM events WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
       GROUP BY event_type"""

  /** Column cleansing ops (`nullify` / `isDefined`) inside an aggregate. */
  def cleanseNullify(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, lit("null")).otherwise(col("lang")).as("lang_raw"))
      .select(col("doc_id"), col("lang_raw").nullify.as("lang_clean"))
      .groupBy(col("lang_clean"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("lang_clean").isDefined, 1L).otherwise(0L)).as("n_defined"))
  }

  val cleanseNullifySql: String =
    """SELECT lang_clean, count(*) AS n,
       cast(sum(CASE WHEN lang_clean IS NOT NULL AND lang_clean <> '' AND lang_clean <> 'null'
                     THEN 1 ELSE 0 END) as bigint) AS n_defined
       FROM (SELECT CASE WHEN lang_raw = 'null' THEN NULL ELSE lang_raw END AS lang_clean
             FROM (SELECT CASE WHEN doc_id % 7 = 0 THEN 'null' ELSE lang END AS lang_raw
                   FROM documents))
       GROUP BY lang_clean"""

  /** The Stage algebra end-to-end: source -> transform -> sink over lineitem. */
  def stagePipeline(spark: SparkSession, dir: String): DataFrame = {
    val out = Files.createTempDirectory("graft_stage_sink").toString
    val pipeline = for {
      raw <- "read_lineitem".source(ctx => ctx.spark.read.parquet(s"$dir/lineitem.parquet"))
      agg <- Stage.transform[org.apache.spark.sql.Row, org.apache.spark.sql.Row]("returned_by_status") { ctx =>
        ctx.value.toDF()
          .filter(col("l_returnflag") === "R")
          .groupBy(col("l_linestatus"))
          .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      }
      _ <- "write_parquet".sink[org.apache.spark.sql.Row](ctx =>
        ctx.value.write.mode("overwrite").parquet(s"$out/returned_by_status"))
    } yield agg
    pipeline.run(Stage.Context(spark, Day(2026, 8, 12))).get.toDF()
  }

  val stagePipelineSql: String =
    """SELECT l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
       FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_linestatus"""

  /** WarehouseTable save(TRUNCATE) + load round trip, partition-parallel. */
  def warehouseRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val root = HdfsUrl(Files.createTempDirectory("graft_wh").toString)
    val table = WarehouseTable(root, "orders_agg")
    val date = Day(2026, 8, 12)
    val slice = t(dir, "orders").filter(col("o_orderstatus") === "F")
    table.save(slice, date, Warehouse.WriteTruncate)
    table.load(spark, date)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(cents(col("o_totalprice"))) / 100.0, 2).as("total"))
  }

  val warehouseRoundtripSql: String =
    s"""SELECT o_orderpriority, count(*) AS n,
       round(cast(sum(${sqlCents("o_totalprice")}) as bigint) / 100.0, 2) AS total
       FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority"""

  /** Gap-based sessionization: one shuffle on user_id, two window passes. */
  def sessionizeEvents(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    events(dir)
      .withColumn("ts_us", micros(col("ts")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"))
  }

  val sessionizeEventsSql: String =
    """SELECT user_id, session_id, count(*) AS n_events,
       max(ts_us) - min(ts_us) AS duration_us
       FROM (
         SELECT user_id, ts_us,
                cast(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS session_id
         FROM (
           SELECT user_id, event_id, ts_us,
                  CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
           FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                        lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
                 FROM events)))
       GROUP BY user_id, session_id"""

  /**
   * `session_paths`: top-20 full event-type paths per 30-minute-gap
   * session — the path-mining read on top of `sessionize_events` ("what
   * do users actually do in a visit"). Each session's path is its
   * event types joined in (ts, event_id) order: one user-keyed window
   * exchange (shared with sessionization), an order-free path build
   * (sort_array over collected (ts, id, type) structs — deterministic
   * under any partitioning), a map-side-combined path count, and a
   * bounded TakeOrdered(20) — never a global sort. Oracle: DuckDB's
   * ordered string_agg over the identical session definition.
   */
  def sessionPaths(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    events(dir)
      .withColumn("ts_us", micros(col("ts")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ts_us"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")),
        ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(20)
  }

  val sessionPathsSql: String =
    """WITH sess AS (
         SELECT user_id, event_id, ts_us, event_type,
                cast(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS session_id
         FROM (
           SELECT user_id, event_id, ts_us, event_type,
                  CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
           FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
                        lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
                 FROM events))),
       paths AS (
         SELECT user_id, session_id,
                string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
         FROM sess GROUP BY user_id, session_id)
       SELECT path, count(*) AS n_sessions FROM paths
       GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20"""

  private[graft] val Priorities =
    Seq("1-URGENT" -> "p1_urgent", "2-HIGH" -> "p2_high", "3-MEDIUM" -> "p3_medium",
      "4-NOT SPECIFIED" -> "p4_not_specified", "5-LOW" -> "p5_low")

  /** Pivot on order priority (conditional aggregation: single shuffle). */
  def ordersPivot(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val aggs = Priorities.map { case (value, alias) =>
      round(sum(when(col("o_orderpriority") === value, cents(col("o_totalprice")))) / 100.0, 2).as(alias)
    }
    t(dir, "orders").groupBy(col("o_orderstatus")).agg(aggs.head, aggs.tail: _*)
  }

  val ordersPivotSql: String = {
    val cols = Priorities.map { case (value, alias) =>
      s"round(cast(sum(CASE WHEN o_orderpriority = '$value' THEN ${sqlCents("o_totalprice")} END) as bigint) / 100.0, 2) AS $alias"
    }.mkString(",\n       ")
    s"SELECT o_orderstatus,\n       $cols\n       FROM orders GROUP BY o_orderstatus"
  }

  /** TPC-H Q14-style: lineitem joins broadcast part; conditional revenue share. */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val rev = cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))
    t(dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01"))
      .join(broadcast(t(dir, "part")), col("l_partkey") === col("p_partkey"))
      .agg(
        money2(sum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0L))))
          .as("promo_revenue"),
        money2(sum(rev)).as("total_revenue"))
  }

  val q14Sql: String = {
    val rev = s"${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})"
    s"""SELECT
       ${sqlMoney2(s"cast(sum(CASE WHEN p_type LIKE 'PROMO%' THEN $rev ELSE 0 END) as bigint)")} AS promo_revenue,
       ${sqlMoney2(s"cast(sum($rev) as bigint)")} AS total_revenue
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'"""
  }

  /**
   * Semi-structured: extract a JSON field from events.props and aggregate.
   * `from_json` with an explicit one-field schema parses each document once
   * into a typed struct (a path query via `get_json_object` re-walks the
   * document text per call and allocates more per row — the difference
   * shows up as GC time under memory pressure, not in the plan).
   */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val propsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))
    events(dir)
      .select(from_json(col("props"), propsSchema).getField("k").as("k"), col("value"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
  }

  val jsonExtractSql: String =
    """SELECT cast(json_extract_string(props, '$.k') as bigint) AS k,
       count(*) AS n, round(sum(value), 4) AS total_value
       FROM events GROUP BY k"""

  /** TPC-H Q7-style: supplier-nation x customer-nation shipping volume by year. */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val n1 = broadcast(t(dir, "nation").select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(t(dir, "nation").select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    t(dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1998-01-01"))
      .join(broadcast(t(dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(t(dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation").isin("NATION_3", "NATION_7") &&
        col("cust_nation").isin("NATION_3", "NATION_7"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(money2(sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))))
        .as("revenue"))
  }

  val q7Sql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       cast(year(l_shipdate) as bigint) AS l_year,
       ${sqlMoney2(s"cast(sum(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})) as bigint)")} AS revenue
       FROM lineitem
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation n1 ON s_nationkey = n1.n_nationkey
       JOIN nation n2 ON c_nationkey = n2.n_nationkey
       WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         AND n1.n_name IN ('NATION_3', 'NATION_7') AND n2.n_name IN ('NATION_3', 'NATION_7')
       GROUP BY 1, 2, 3"""

  /** TPC-H Q8-style: one nation's market share of region revenue by year. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val vol = cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))
    val nations = broadcast(t(dir, "nation")
      .join(broadcast(t(dir, "region")).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name")))
    t(dir, "lineitem")
      .join(broadcast(t(dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(nations, col("s_nationkey") === col("n_nationkey"))
      .groupBy(year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum(when(col("n_name") === "NATION_7", vol).otherwise(lit(0L))).cast("double") /
        greatest(sum(vol), lit(1L)), 6).as("mkt_share"))
  }

  val q8Sql: String = {
    val vol = s"${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})"
    s"""SELECT cast(year(l_shipdate) as bigint) AS l_year,
       round(cast(sum(CASE WHEN n_name = 'NATION_7' THEN $vol ELSE 0 END) as bigint)
             / cast(greatest(sum($vol), 1) as double), 6) AS mkt_share
       FROM lineitem
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
       GROUP BY 1"""
  }

  /** Anti join: orders with no lineitem shipped after the cutoff, by status. */
  def ordersNoLateItems(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val late = t(dir, "lineitem").filter(col("l_shipdate") > lit("2000-01-01"))
      .select(col("l_orderkey"))
    t(dir, "orders")
      .join(late, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(cents(col("o_totalprice"))) / 100.0, 2).as("total"))
  }

  val ordersNoLateItemsSql: String =
    s"""SELECT o_orderstatus, count(*) AS n,
       round(cast(sum(${sqlCents("o_totalprice")}) as bigint) / 100.0, 2) AS total
       FROM orders WHERE NOT EXISTS (
         SELECT 1 FROM lineitem
         WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '2000-01-01')
       GROUP BY o_orderstatus"""

  /**
   * ISO-week revenue rollup driven by the [[graft.time.Week]] interval type:
   * the week boundaries come from `Week.by(Day)` semantics, surfaced as the
   * ISO week-year string both engines compute identically.
   */
  def weeklyRevenue(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val q1_1997 = graft.time.Quarter(1997, graft.time.Quarter.Q1)
    t(dir, "orders")
      .filter(col("o_orderdate") >= lit(q1_1997.start.toString) &&
        col("o_orderdate") < lit(q1_1997.end.start.toString))
      .groupBy(weekofyear(col("o_orderdate")).cast("long").as("iso_week"))
      .agg(count(lit(1)).as("n"),
        round(sum(cents(col("o_totalprice"))) / 100.0, 2).as("total"))
  }

  val weeklyRevenueSql: String =
    s"""SELECT cast(weekofyear(o_orderdate) as bigint) AS iso_week, count(*) AS n,
       round(cast(sum(${sqlCents("o_totalprice")}) as bigint) / 100.0, 2) AS total
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
       GROUP BY iso_week"""

  /**
   * As-of join: each purchase event picks up the user's latest prior signup
   * value — one shuffle on user_id via the tagged-union window (see
   * [[Joins.asOf]]), never a non-equi join. DuckDB's native ASOF JOIN is the
   * oracle.
   */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), micros(col("ts")).as("ts_us"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), micros(col("ts")).as("ts_us"))
      .agg(round(max(col("value")), 4).as("signup_value"))
    Joins.asOf(purchases, signups, Seq("user_id"), "ts_us")
  }

  val asofJoinSql: String =
    """SELECT p.user_id, p.ts_us, p.event_id, s.signup_value AS asof_signup_value
       FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
             WHERE event_type = 'purchase') p
       ASOF LEFT JOIN (SELECT user_id, epoch_us(ts) AS ts_us, round(max(value), 4) AS signup_value
                       FROM events WHERE event_type = 'signup' GROUP BY 1, 2) s
       ON p.user_id = s.user_id AND p.ts_us >= s.ts_us"""

  /**
   * Range join: how many orders fall inside each 7-day window opened by a
   * low-key customer's order. Bucketed equi-join ([[Joins.rangeJoin]]) on the
   * Spark side; DuckDB's IEJoin handles the raw inequality oracle.
   */
  def rangeJoinCount(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val day = datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")).cast("long")
    val points = t(dir, "orders").select(day.as("d"))
    val intervals = t(dir, "orders").filter(col("o_custkey") <= 5)
      .select(col("o_orderkey").as("interval_id"), day.as("d_start"), (day + 7).as("d_end"))
    Joins.rangeJoin(points, intervals, "d", "d_start", "d_end", bucketWidth = 7)
      .groupBy(col("interval_id"))
      .agg(count(lit(1)).as("n"))
  }

  val rangeJoinCountSql: String =
    """SELECT interval_id, count(*) AS n
       FROM (SELECT o_orderkey AS interval_id, cast(epoch(o_orderdate) as bigint) // 86400 AS d0
             FROM orders WHERE o_custkey <= 5) iv
       JOIN (SELECT cast(epoch(o_orderdate) as bigint) // 86400 AS d FROM orders) pts
         ON pts.d >= iv.d0 AND pts.d < iv.d0 + 7
       GROUP BY interval_id"""

  /** TPC-H Q4 shape: orders having a late-shipped item (EXISTS), by priority. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val li = t(dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    t(dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1998-01-01"))
      .join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate").cast("date") > date_add(col("o_orderdate").cast("date"), 60), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND cast(l_shipdate as date) > cast(o_orderdate as date) + 60)
       GROUP BY o_orderpriority"""

  /** TPC-H Q18 shape: large-quantity orders joined back to their customer. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val big = t(dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 250)
    t(dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t(dir, "customer")), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        round(cents(col("o_totalprice")) / 100.0, 2).as("total"), col("sum_qty"))
  }

  val q18Sql: String =
    s"""SELECT c_name, o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(${sqlCents("o_totalprice")} / 100.0, 2) AS total, sum_qty
       FROM orders
       JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
             GROUP BY l_orderkey HAVING sum(l_quantity) > 250) big
         ON o_orderkey = l_orderkey
       JOIN customer ON o_custkey = c_custkey"""

  /** Argmin-per-group (TPC-H Q2 shape): cheapest supplier lineitem per part. */
  def cheapestSupplier(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val w = Window.partitionBy(col("l_partkey")).orderBy(col("price_cents"), col("l_suppkey"))
    t(dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), cents(col("l_extendedprice")).as("price_cents"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_partkey"), col("l_suppkey"), round(col("price_cents") / 100.0, 2).as("min_price"))
  }

  val cheapestSupplierSql: String =
    s"""SELECT l_partkey, l_suppkey, round(price_cents / 100.0, 2) AS min_price FROM (
       SELECT l_partkey, l_suppkey, ${sqlCents("l_extendedprice")} AS price_cents,
              row_number() OVER (PARTITION BY l_partkey
                                 ORDER BY ${sqlCents("l_extendedprice")}, l_suppkey) AS rn
       FROM lineitem) WHERE rn = 1"""

  /** Hierarchical rollup (GROUPING SETS): status x priority with subtotals. */
  def rollupOrders(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(cents(col("o_totalprice"))) / 100.0, 2).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
  }

  val rollupOrdersSql: String =
    s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n,
       round(cast(sum(${sqlCents("o_totalprice")}) as bigint) / 100.0, 2) AS total
       FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"""

  /**
   * `cube_revenue`: full CUBE over (nation, order year) with explicit
   * `grouping()` markers — all four aggregation levels (cell, per-nation,
   * per-year, grand total) in ONE shuffle (Spark expands the grouping
   * sets map-side; no union of four scans), and the g_* flags
   * disambiguate "subtotal row" from a genuine null group the way the
   * ROLLUP query's 'ALL' sentinel cannot. The other dims stay coalesced
   * sentinels so no nullable-int column reaches the compare.
   */
  def cubeRevenue(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "orders")
      .join(t(dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .withColumn("yr", year(col("o_orderdate")).cast("long"))
      .cube(col("n_name"), col("yr"))
      .agg(grouping(col("n_name")).cast("long").as("g_nation"),
        grouping(col("yr")).cast("long").as("g_year"),
        count(lit(1)).as("n"),
        round(sum(cents(col("o_totalprice"))) / 100.0, 2).as("revenue"))
      .select(coalesce(col("n_name"), lit("")).as("nation"),
        coalesce(col("yr"), lit(0L)).as("yr"),
        col("g_nation"), col("g_year"), col("n"), col("revenue"))
  }

  val cubeRevenueSql: String =
    s"""SELECT coalesce(n_name, '') AS nation,
       CAST(coalesce(yr, 0) AS BIGINT) AS yr,
       CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
       CAST(GROUPING(yr) AS BIGINT) AS g_year,
       count(*) AS n,
       round(cast(sum(cents) as bigint) / 100.0, 2) AS revenue
       FROM (SELECT n_name, year(cast(o_orderdate as date)) AS yr,
                    ${sqlCents("o_totalprice")} AS cents
             FROM orders JOIN customer ON o_custkey = c_custkey
                         JOIN nation ON c_nationkey = n_nationkey)
       GROUP BY CUBE(n_name, yr)"""

  /**
   * `grouping_sets_revenue`: explicit GROUPING SETS — the general form
   * ROLLUP/CUBE are sugar for: exactly the (status, priority), (status)
   * and () levels WITHOUT the (priority) level a CUBE would force (the
   * shape a report wants when one dimension is primary), disambiguated
   * by `grouping_id()`. Spark expands the sets map-side — one shuffle,
   * never a union of three scans.
   */
  def groupingSetsRevenue(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    // Column API (Spark 4 Dataset.groupingSets) + the money2 integer-cents
    // law: the earlier SQL-string form's `/ 100.0` literal parsed as
    // DECIMAL(3,1), yielding a DECIMAL(24,2) revenue that serialized with
    // a trailing zero the DOUBLE oracle lacks (round-15 hash red).
    val status = col("o_orderstatus")
    val priority = col("o_orderpriority")
    t(dir, "orders")
      .groupingSets(Seq(Seq(status, priority), Seq(status), Seq.empty),
                    status, priority)
      .agg(grouping_id(status, priority).cast("long").as("gid"),
           count(lit(1)).as("n"),
           money2(sum(cents(col("o_totalprice"))), perCent = 1L).as("revenue"))
      .select(coalesce(status, lit("")).as("status"),
              coalesce(priority, lit("")).as("priority"),
              col("gid"), col("n"), col("revenue"))
  }

  val groupingSetsRevenueSql: String =
    s"""SELECT coalesce(o_orderstatus, '') AS status,
       coalesce(o_orderpriority, '') AS priority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       count(*) AS n,
       ${sqlMoney2(s"sum(${sqlCents("o_totalprice")})", 1L)} AS revenue
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                               (o_orderstatus), ())"""

  /** TPC-H Q13 shape: histogram of customers by order count (outer join). */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val perCust = t(dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    t(dir, "customer")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist FROM (
       SELECT c_custkey, count(o_orderkey) AS c_count
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey)
       GROUP BY c_count"""

  /**
   * TPC-H Q22 shape: scalar subquery (above-average balance) + anti join
   * (no recent orders). The balance cutoff compares in EXACT integer cents —
   * `bal * n > sum` instead of `bal > sum/n` — so an engine's floating
   * average can never flip a borderline customer.
   */
  def q22AcctBal(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val cust = t(dir, "customer")
    val stats = cust.filter(col("c_acctbal") > 0)
      .agg(sum(cents(col("c_acctbal"))).as("__sum"), count(lit(1)).as("__n"))
    val recent = t(dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01"))
      .select(col("o_custkey"))
    cust
      .join(broadcast(stats), lit(true))
      .filter(cents(col("c_acctbal")) * col("__n") > col("__sum"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(cents(col("c_acctbal"))) / 100.0, 2).as("totacctbal"))
  }

  val q22Sql: String = {
    val c = sqlCents("c_acctbal")
    s"""SELECT c_nationkey, count(*) AS numcust,
       round(cast(sum($c) as bigint) / 100.0, 2) AS totacctbal
       FROM customer,
            (SELECT sum($c) AS s, count(*) AS n FROM customer WHERE c_acctbal > 0) stats
       WHERE $c * n > s
         AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                         AND o_orderdate >= TIMESTAMP '2000-01-01')
       GROUP BY c_nationkey"""
  }

  /** Exact interpolated percentiles (median/p90) of event value per type. */
  def percentileValues(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    events(dir)
      .groupBy(col("event_type"))
      .agg(round(percentile(col("value"), lit(0.5)), 4).as("p50"),
        round(percentile(col("value"), lit(0.9)), 4).as("p90"))
  }

  val percentileValuesSql: String =
    """SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90
       FROM events GROUP BY event_type"""

  /** Trailing moving average (ROWS frame) of event values per user. */
  def movingAvg(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    events(dir)
      .select(col("event_id"), col("user_id"), micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("avg3", round(avg(col("value")).over(w), 4))
      .select(col("event_id"), col("user_id"), col("avg3"))
  }

  val movingAvgSql: String =
    """SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3
       FROM events"""

  /**
   * TPC-H Q6: pure scan-side filter + global agg — zero shuffles, every
   * predicate in `PushedFilters` (the discount bounds compare the raw
   * column, not a derived expression, precisely to stay pushable).
   */
  def q6Revenue(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .agg(money2(sum(cents(col("l_extendedprice")) * pct(col("l_discount"))))
        .as("revenue"))
  }

  val q6Sql: String =
    s"""SELECT ${sqlMoney2(s"cast(sum(${sqlCents("l_extendedprice")} * ${sqlCents("l_discount")}) as bigint)")} AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"""

  /**
   * TPC-H Q9 shape (no partsupp in this schema: `p_retailprice` stands in
   * for supply cost): profit by nation and order year. Part/supplier/nation
   * broadcast; the lineitem⋈orders join is the one big shuffle. Profit in
   * exact 10^-4-dollar units until the final division.
   */
  def q9ProfitByNation(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val amount = cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount"))) -
      cents(col("p_retailprice")) * col("l_quantity").cast("long") * 100L
    t(dir, "lineitem")
      .join(broadcast(t(dir, "part").filter(col("p_name").contains("widget"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(t(dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(money2(sum(amount)).as("sum_profit"))
  }

  val q9Sql: String = {
    val amount = s"${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")}) - " +
      s"${sqlCents("p_retailprice")} * cast(l_quantity as bigint) * 100"
    s"""SELECT n_name, cast(year(o_orderdate) as bigint) AS o_year,
       ${sqlMoney2(s"cast(sum($amount) as bigint)")} AS sum_profit
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN orders ON l_orderkey = o_orderkey
       WHERE p_name LIKE '%widget%'
       GROUP BY n_name, year(o_orderdate)"""
  }

  /** TPC-H Q10: returned-item losses per customer, one quarter, top 20. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(broadcast(t(dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1997-04-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(money2(sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String = {
    val rev = s"${sqlMoney2(s"cast(sum(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})) as bigint)")}"
    s"""SELECT c_custkey, c_name, c_acctbal, n_name, revenue FROM (
       SELECT c_custkey, c_name, c_acctbal, n_name, $rev AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE l_returnflag = 'R'
         AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
       GROUP BY c_custkey, c_name, c_acctbal, n_name)
       ORDER BY revenue DESC, c_custkey LIMIT 20"""
  }

  /**
   * TPC-H Q11 shape (value share from lineitem; no partsupp): parts whose
   * total traded value exceeds 1/1500 of the corpus total. The global
   * threshold is a broadcast scalar — agg once, never a driver collect; the
   * share compare is exact integer cross-multiplication.
   */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val vals = t(dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_extendedprice"))).as("value_c"))
    val total = vals.agg(sum(col("value_c")).as("total_c"))
    vals.join(broadcast(total))
      .filter(col("value_c") * 1500L > col("total_c"))
      .select(col("l_partkey"), round(col("value_c") / 100.0, 2).as("part_value"))
  }

  val q11Sql: String =
    s"""WITH v AS (SELECT l_partkey, sum(${sqlCents("l_extendedprice")}) AS value_c
                   FROM lineitem GROUP BY l_partkey)
       SELECT l_partkey, round(cast(value_c as bigint) / 100.0, 2) AS part_value
       FROM v, (SELECT sum(value_c) AS total_c FROM v) t
       WHERE value_c * 1500 > total_c"""

  /**
   * TPC-H Q12 shape (order-priority classes per line status; this schema has
   * no shipmode): one broadcast join + conditional counts, single shuffle.
   */
  def q12PriorityLines(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01"))
      .join(broadcast(t(dir, "orders")), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  val q12Sql: String =
    """SELECT l_linestatus,
       cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) as bigint) AS high_line_count,
       cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) as bigint) AS low_line_count
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
       GROUP BY l_linestatus"""

  /**
   * TPC-H Q15: top supplier(s) by quarterly revenue — agg, broadcast the
   * scalar max back, equality-select. No window over the whole agg, no
   * driver collect.
   */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val rev = t(dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))).as("rev_c"))
    val top = rev.agg(max(col("rev_c")).as("max_c"))
    rev.join(broadcast(top))
      .filter(col("rev_c") === col("max_c"))
      .join(broadcast(t(dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), money2(col("rev_c")).as("total_revenue"))
  }

  val q15Sql: String =
    s"""WITH rev AS (
         SELECT l_suppkey, sum(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})) AS rev_c
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, ${sqlMoney2(s"cast(rev_c as bigint)")} AS total_revenue
       FROM rev JOIN supplier ON l_suppkey = s_suppkey,
            (SELECT max(rev_c) AS max_c FROM rev) t
       WHERE rev_c = max_c"""

  /**
   * TPC-H Q16 shape: supplier variety per (brand, type, size) — broadcast
   * dim join + count-distinct, i.e. two-phase agg on a composite key.
   */
  def q16SupplierVariety(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "lineitem")
      .join(broadcast(t(dir, "part")
        .filter(col("p_brand") =!= "Brand#1" && col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
       GROUP BY p_brand, p_type, p_size"""

  /**
   * TPC-H Q17: revenue from small-quantity lines, against a per-part average
   * computed over the pruned (brand-only) lineitem slice. The quantity bar
   * `qty < avg/5` is cross-multiplied (`qty*5 < avg`) so both engines
   * compare the same exact doubles.
   */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val brandLines = t(dir, "lineitem")
      .join(broadcast(t(dir, "part").filter(col("p_brand") === "Brand#3").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
    val perPart = brandLines.groupBy(col("l_partkey")).agg(avg(col("l_quantity")).as("aq"))
    brandLines
      .join(broadcast(perPart), Seq("l_partkey"))
      .filter(col("l_quantity") * 5 < col("aq"))
      .agg(round(sum(cents(col("l_extendedprice"))) / 100.0 / 7.0, 2).as("avg_yearly"))
  }

  val q17Sql: String =
    s"""WITH bl AS (SELECT l_partkey, l_quantity, l_extendedprice
                    FROM lineitem JOIN part ON l_partkey = p_partkey
                    WHERE p_brand = 'Brand#3'),
       pp AS (SELECT l_partkey, avg(l_quantity) AS aq FROM bl GROUP BY l_partkey)
       SELECT round(cast(sum(${sqlCents("l_extendedprice")}) as bigint) / 100.0 / 7.0, 2) AS avg_yearly
       FROM bl JOIN pp USING (l_partkey)
       WHERE l_quantity * 5 < aq"""

  /**
   * TPC-H Q19: disjunctive brand/size/quantity predicates over a broadcast
   * part join — one OR-of-ANDs residual filter, zero extra shuffles.
   */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val cond =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) && col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) && col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) && col("l_quantity").between(20, 30))
    t(dir, "lineitem")
      .join(broadcast(t(dir, "part")), col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(money2(sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))))
        .as("revenue"))
  }

  val q19Sql: String =
    s"""SELECT ${sqlMoney2(s"cast(sum(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})) as bigint)")} AS revenue
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"""

  /**
   * TPC-H Q20 shape: suppliers who moved heavy volume of the targeted parts
   * in 1996 — agg on (partkey, suppkey), semi-join chain up to suppliers.
   * No subquery re-scan: the one lineitem agg feeds every later filter.
   */
  def q20HeavySuppliers(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val heavy = t(dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .join(broadcast(t(dir, "part").filter(col("p_name").startsWith("small"))
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
      .filter(col("qty") > 50)
      .select(col("l_suppkey")).distinct()
    t(dir, "supplier")
      // the heavy set is bounded by the supplier dim — broadcast the semi side
      .join(broadcast(heavy), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(t(dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), col("n_name"), col("s_acctbal"))
  }

  val q20Sql: String =
    """SELECT s_name, n_name, s_acctbal
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
       WHERE s_suppkey IN (
         SELECT l_suppkey FROM (
           SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
           GROUP BY l_partkey, l_suppkey)
         WHERE qty > 50)"""

  /**
   * TPC-H Q21 shape (`l_returnflag = 'R'` marks a problem line; this schema
   * has no receipt/commit dates): suppliers solely to blame on
   * multi-supplier orders. One agg per orderkey replaces the classic
   * EXISTS/NOT-EXISTS self-join pair — lineitem is scanned once, shuffled
   * once on orderkey, once on suppkey.
   */
  def q21SoleBlame(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    // one scan, two codegen HashAggregates: collapse to distinct
    // (order, supplier) pairs with an any-R flag first, then per-order
    // counts decide the qualifying orders and min() pops their sole
    // flagged supplier (a size-1 set's min IS its element). The former
    // countDistinct + collect_list single agg planned as an
    // ObjectHashAggregate with distinct expansion — row doubling plus
    // per-group array building that whole-stage codegen cannot touch
    // (guide step 4); this form ships only the collapsed pairs
    t(dir, "lineitem")
      .where(col("l_suppkey").isNotNull) // countDistinct's null law, kept explicit
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("__flg"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"), sum(col("__flg")).as("n_flagged"),
        min(when(col("__flg") === 1L, col("l_suppkey"))).as("l_suppkey"))
      .filter(col("n_supp") > 1 && col("n_flagged") === 1)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(t(dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  val q21Sql: String =
    """SELECT s_name, numwait FROM (
       SELECT l_suppkey, count(*) AS numwait FROM (
         SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R') f
       JOIN (
         SELECT l_orderkey FROM (
           SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
                  count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_flagged
           FROM lineitem GROUP BY l_orderkey)
         WHERE n_supp > 1 AND n_flagged = 1) o USING (l_orderkey)
       GROUP BY l_suppkey) w
       JOIN supplier ON l_suppkey = s_suppkey
       ORDER BY numwait DESC, s_name LIMIT 10"""

  // =====================================================================
  // LLM training-data operators
  // =====================================================================
}
