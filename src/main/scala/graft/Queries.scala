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
 * The correctness + benchmark battery: one named query per SURVEY.md §2
 * capability, each paired with an ANSI-SQL oracle the driver runs in DuckDB
 * over the same parquet tables.
 *
 * Cross-engine determinism rules (SURVEY.md §6):
 *  - money sums go through exact integer arithmetic (cents / percent units)
 *    so double summation order can never flip a rounded digit;
 *  - every per-row computation uses only engine-portable primitives (md5,
 *    substring, regexp) that produce bit-identical results;
 *  - every top-k / window has a total-order tiebreaker;
 *  - timestamps surface as formatted strings or epoch micros, never raw;
 *  - all integer outputs are 64-bit on both sides.
 */
object Queries {

  // ---- portable helpers (Spark side) ----------------------------------

  /** Exact cents: prices have 2 decimals, so this is lossless. */
  private def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Exact percent units for 2-decimal rates (discount, tax). */
  private def pct(c: Column): Column = round(c * 100, 0).cast("long")

  private def t(dir: String, name: String)(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /**
   * `events.ts` is nanosecond-precision parquet, which Spark 4 only reads as
   * a raw long (`spark.sql.legacy.parquet.nanosAsLong`, set by Verify/Bench).
   * Truncate to micros with exact integer division (the ns values exceed
   * 2^53, so double division would corrupt them) — matching DuckDB's own
   * ns -> us truncation.
   */
  private def events(dir: String)(implicit spark: SparkSession): DataFrame = {
    val df = t(dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => df
    }
  }

  /** `ts` columns may load as TIMESTAMP_NTZ; normalize (UTC session). */
  private def micros(c: Column): Column = unix_micros(c.cast("timestamp"))

  // ---- portable helpers (DuckDB side) ---------------------------------

  private def sqlCents(c: String) = s"cast(round($c * 100, 0) as bigint)"

  /** DuckDB twin of `TextAnalysis.hashBucket`: first-16-bit md5 bucket of
    * `salt:id` in [0, 65536) — one definition for every sampling oracle. */
  private def sqlHashBucket(idExpr: String, salt: String = "graft"): String = {
    def digit(i: Int) =
      s"(strpos('0123456789abcdef', substring(md5('$salt:' || $idExpr), $i, 1)) - 1)"
    s"(((${digit(1)} * 16 + ${digit(2)}) * 16 + ${digit(3)}) * 16 + ${digit(4)})"
  }
  private val Norm = raw"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"
  private val Toks = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
  /** Cosine over `qv`/`nv` list columns (twin of [[Similarity.cosine]]).
    * Declared with the other SQL helpers: any val referenced by an earlier
    * val would silently interpolate as "null" (Scala init order). */
  private val SqlCos = {
    val dot = "list_sum(list_transform(range(1, len(qv) + 1), i -> cast(qv[i] as double) * cast(nv[i] as double)))"
    val nq = "sqrt(list_sum(list_transform(qv, x -> cast(x as double) * cast(x as double))))"
    val nn = "sqrt(list_sum(list_transform(nv, x -> cast(x as double) * cast(x as double))))"
    // zero-norm guard mirrors the kernel: cosine against a zero vector is 0,
    // never NaN (NaN sorts first under DuckDB's ORDER BY DESC but last in
    // Spark's struct min — a silent rank divergence)
    s"round(CASE WHEN $nq * $nn = 0 THEN 0 ELSE $dot / ($nq * $nn) END, 4)"
  }

  /** Word 5-gram shingles over a `toks` column (twin of [[Dedup.wordShingles]]). */
  private val SqlShingles =
    "list_distinct(list_transform(range(1, greatest(len(toks) - 4, 1) + 1), i -> array_to_string(toks[i:i+4], ' ')))"
  private val SqlShingleDocs =
    s"(SELECT doc_id, $SqlShingles AS sh FROM (SELECT doc_id, $Toks AS toks FROM documents))"

  // =====================================================================
  // Framework battery
  // =====================================================================

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
        round(sum(cents(col("l_extendedprice")) * disc) / 10000.0, 2).as("sum_disc_price"),
        round(sum(cents(col("l_extendedprice")) * disc * tax) / 1000000.0, 2).as("sum_charge"),
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
       round(cast(sum($c * $d) as bigint) / 10000.0, 2) AS sum_disc_price,
       round(cast(sum($c * $d * $x) as bigint) / 1000000.0, 2) AS sum_charge,
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
      .agg(round(sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))) / 10000.0, 2)
        .as("revenue"))
      .select(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String = {
    val rev = s"round(cast(sum(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})) as bigint) / 10000.0, 2)"
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
      .agg(round(sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))) / 10000.0, 2)
        .as("revenue"))
  }

  val q5Sql: String =
    s"""SELECT n_name,
       round(cast(sum(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})) as bigint) / 10000.0, 2) AS revenue
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

  private val Priorities =
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
        round(sum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0L))) / 10000.0, 2)
          .as("promo_revenue"),
        round(sum(rev) / 10000.0, 2).as("total_revenue"))
  }

  val q14Sql: String = {
    val rev = s"${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})"
    s"""SELECT
       round(cast(sum(CASE WHEN p_type LIKE 'PROMO%' THEN $rev ELSE 0 END) as bigint) / 10000.0, 2) AS promo_revenue,
       round(cast(sum($rev) as bigint) / 10000.0, 2) AS total_revenue
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
      .agg(round(sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))) / 10000.0, 2)
        .as("revenue"))
  }

  val q7Sql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       cast(year(l_shipdate) as bigint) AS l_year,
       round(cast(sum(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})) as bigint) / 10000.0, 2) AS revenue
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
      .agg(round(sum(cents(col("l_extendedprice")) * pct(col("l_discount"))) / 10000.0, 2)
        .as("revenue"))
  }

  val q6Sql: String =
    s"""SELECT round(cast(sum(${sqlCents("l_extendedprice")} * ${sqlCents("l_discount")}) as bigint) / 10000.0, 2) AS revenue
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
      .agg(round(sum(amount) / 10000.0, 2).as("sum_profit"))
  }

  val q9Sql: String = {
    val amount = s"${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")}) - " +
      s"${sqlCents("p_retailprice")} * cast(l_quantity as bigint) * 100"
    s"""SELECT n_name, cast(year(o_orderdate) as bigint) AS o_year,
       round(cast(sum($amount) as bigint) / 10000.0, 2) AS sum_profit
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
      .agg(round(sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))) / 10000.0, 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String = {
    val rev = s"round(cast(sum(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})) as bigint) / 10000.0, 2)"
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
      .select(col("s_suppkey"), col("s_name"), round(col("rev_c") / 10000.0, 2).as("total_revenue"))
  }

  val q15Sql: String =
    s"""WITH rev AS (
         SELECT l_suppkey, sum(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})) AS rev_c
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, round(cast(rev_c as bigint) / 10000.0, 2) AS total_revenue
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
      .agg(round(sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))) / 10000.0, 2)
        .as("revenue"))
  }

  val q19Sql: String =
    s"""SELECT round(cast(sum(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})) as bigint) / 10000.0, 2) AS revenue
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
    // one scan, one per-order agg: the flagged-supplier set rides along as a
    // collect_list (collect_list drops the nulls of unflagged lines), so the
    // qualifying orders' sole supplier pops out of the same shuffle — no
    // second lineitem scan, no join back
    t(dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        array_distinct(collect_list(when(col("l_returnflag") === "R", col("l_suppkey"))))
          .as("flagged"))
      .filter(col("n_supp") > 1 && size(col("flagged")) === 1)
      .select(element_at(col("flagged"), 1).as("l_suppkey"))
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

  /** Exact dedup: one shuffle on the normalized-text hash. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    Dedup.exact(t(dir, "documents"), "text", "doc_id")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
  }

  val dedupExactSql: String =
    s"""SELECT doc_id, md5($Norm) AS fp FROM (
       SELECT doc_id, text,
              row_number() OVER (PARTITION BY md5($Norm) ORDER BY doc_id) AS rn
       FROM documents) WHERE rn = 1"""

  /** MinHash signatures (4 seeds shown; per-row, shuffle-free). */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    Dedup.withMinhashSignature(t(dir, "documents").select(col("doc_id"), col("text")), "text", numHashes = 4)
      .select(col("doc_id"), col("mh0"), col("mh1"), col("mh2"), col("mh3"))
  }

  /** DuckDB twin of [[Dedup.minhash]]: word `j%4` of the md5 of block `j/4`. */
  private def sqlMinhash(j: Int): String =
    s"list_min(list_transform(sh, s -> substring(md5(s || ':${j / 4}'), ${(j % 4) * 8 + 1}, 8)))"

  val minhashSignaturesSql: String = {
    val mhs = (0 until 4)
      .map(j => s"${sqlMinhash(j)} AS mh$j").mkString(",\n       ")
    s"""SELECT doc_id,
       $mhs
       FROM $SqlShingleDocs"""
  }

  /** LSH banding: candidates from an equi-join on (band, hash) — no crossJoin. */
  def lshCandidatePairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.lshCandidatePairs(t(dir, "documents")(spark), "doc_id", "text",
      numHashes = 12, rowsPerBand = 3)

  val lshCandidatePairsSql: String = {
    val mhs = (0 until 12)
      .map(j => s"${sqlMinhash(j)} AS mh$j").mkString(", ")
    val bands = (0 until 4)
      .map(b => s"md5(mh${3 * b} || '|' || mh${3 * b + 1} || '|' || mh${3 * b + 2}) AS band$b").mkString(", ")
    val unpivot = (0 until 4)
      .map(b => s"SELECT doc_id, $b AS band, band$b AS bh FROM banded").mkString(" UNION ALL ")
    s"""WITH sig AS (SELECT doc_id, $mhs
                     FROM $SqlShingleDocs),
       banded AS (SELECT doc_id, $bands FROM sig),
       buckets AS ($unpivot),
       capped AS (SELECT doc_id, band, bh FROM buckets
                  QUALIFY count(*) OVER (PARTITION BY band, bh) <= 1000)
       SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       FROM capped a JOIN capped b ON a.band = b.band AND a.bh = b.bh
       WHERE a.doc_id < b.doc_id"""
  }

  /**
   * Salted hot-bucket LSH pairing ([[Dedup.lshCandidatePairs]] with
   * `saltHotBuckets`): `maxBucket = 2` forces every bucket of 3+ docs
   * through the salted self-join path on real data. Salting is no-loss by
   * construction, so the result must equal the UNCAPPED pair set — which
   * is exactly what the oracle computes (no QUALIFY cap).
   */
  def lshSaltedPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.lshCandidatePairs(t(dir, "documents")(spark), "doc_id", "text",
      numHashes = 12, rowsPerBand = 3, maxBucket = 2, saltHotBuckets = true)

  val lshSaltedPairsSql: String = {
    val mhs = (0 until 12)
      .map(j => s"${sqlMinhash(j)} AS mh$j").mkString(", ")
    val bands = (0 until 4)
      .map(b => s"md5(mh${3 * b} || '|' || mh${3 * b + 1} || '|' || mh${3 * b + 2}) AS band$b").mkString(", ")
    val unpivot = (0 until 4)
      .map(b => s"SELECT doc_id, $b AS band, band$b AS bh FROM banded").mkString(" UNION ALL ")
    s"""WITH sig AS (SELECT doc_id, $mhs
                     FROM $SqlShingleDocs),
       banded AS (SELECT doc_id, $bands FROM sig),
       buckets AS ($unpivot)
       SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       FROM buckets a JOIN buckets b ON a.band = b.band AND a.bh = b.bh
       WHERE a.doc_id < b.doc_id"""
  }

  /**
   * Benchmark decontamination report ([[Decontaminate.contaminationHits]]):
   * every 17th document plays the eval set; training docs sharing >= 3
   * distinct word 5-grams with a bench doc are flagged with the exact
   * overlap count. Bench side broadcasts; the corpus gram stream never
   * shuffles before the hit-count agg.
   */
  def contaminationHits(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(dir, "documents")(spark)
    val bench = docs.filter(col("doc_id") % 17 === 0)
      .select(col("doc_id").as("bid"), col("text"))
    graft.ops.Decontaminate.contaminationHits(
      docs, "doc_id", "text", bench, "bid", "text", n = 5, minHits = 3)
  }

  val contaminationHitsSql: String =
    s"""WITH docg AS (SELECT doc_id, unnest(sh) AS g FROM $SqlShingleDocs),
       benchg AS (SELECT doc_id AS bench_id, unnest(sh) AS g
                  FROM $SqlShingleDocs WHERE doc_id % 17 = 0)
       SELECT d.doc_id, b.bench_id, count(*) AS hits
       FROM docg d JOIN benchg b ON d.g = b.g
       GROUP BY 1, 2
       HAVING count(*) >= 3"""

  /**
   * `decontaminate_sentences`: surgical decontamination
   * ([[graft.ops.Decontaminate.redactContaminatedSentences]]) over
   * two-sentence pages (`text || '. ' || reverse(text)` — the second,
   * char-reversed sentence never matches the probes, so the oracle
   * proves SENTENCE-level surgery: leaked docs lose exactly their first
   * sentence, not the document). Probes are docs 7/77/177 as in
   * `contamination`.
   */
  def decontaminateSentences(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents")
    val pages = docs.select(col("doc_id"),
      concat(col("text"), lit(". "), reverse(col("text"))).as("page"))
    val probes = docs.filter(col("doc_id").isin(7L, 77L, 177L)).select(col("text"))
    graft.ops.Decontaminate
      .redactContaminatedSentences(pages, "doc_id", "page", probes, "text", n = 3)
      .select(col("doc_id"), col("n_sentences"), col("n_redacted"),
        md5(col("clean_text")).as("clean_fp"))
  }

  val decontaminateSentencesSql: String = {
    def stoks(s: String) =
      s"list_filter(string_split_regex(lower($s), '[^a-z0-9]+'), x -> x <> '')"
    // FULL 3-grams only (greatest(len - 2, 0): a < 3-token input yields no
    // grams, mirroring redactContaminatedSentences's padded-shingle filter)
    def sh3(s: String) =
      s"list_distinct(list_transform(range(1, greatest(len(${stoks(s)}) - 2, 0) + 1), i -> array_to_string(${stoks(s)}[i:i+2], ' ')))"
    s"""WITH pg AS (SELECT list(DISTINCT g) AS pg FROM (
           SELECT unnest(${sh3("text")}) AS g
           FROM documents WHERE doc_id IN (7, 77, 177))),
       pages AS (SELECT doc_id, text || '. ' || reverse(text) AS page FROM documents),
       marked AS (
         SELECT doc_id,
           regexp_extract_all(page, '[^.!?]+[.!?]+|[^.!?]+${"$"}') AS sents,
           list_transform(regexp_extract_all(page, '[^.!?]+[.!?]+|[^.!?]+${"$"}'),
             s -> CASE WHEN list_has_any(${sh3("s")}, pg)
                  THEN 1 ELSE 0 END) AS hits
         FROM pages, pg)
       SELECT doc_id,
         cast(len(sents) as bigint) AS n_sentences,
         cast(coalesce(list_sum(hits), 0) as bigint) AS n_redacted,
         md5(array_to_string(
           list_transform(list_filter(range(1, len(sents) + 1), i -> hits[i] = 0),
             i -> sents[i]), '')) AS clean_fp
       FROM marked"""
  }

  /** The corpus after decontamination: flagged docs anti-joined away. */
  def decontaminatedDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(dir, "documents")(spark)
    val bench = docs.filter(col("doc_id") % 17 === 0)
      .select(col("doc_id").as("bid"), col("text"))
    graft.ops.Decontaminate.removeContaminated(
      docs, "doc_id", "text", bench, "bid", "text", n = 5, minHits = 3)
      .select(col("doc_id"))
  }

  val decontaminatedDocsSql: String =
    s"""WITH docg AS (SELECT doc_id, unnest(sh) AS g FROM $SqlShingleDocs),
       benchg AS (SELECT doc_id AS bench_id, unnest(sh) AS g
                  FROM $SqlShingleDocs WHERE doc_id % 17 = 0),
       flagged AS (
         SELECT d.doc_id FROM docg d JOIN benchg b ON d.g = b.g
         GROUP BY d.doc_id, b.bench_id HAVING count(*) >= 3)
       SELECT doc_id FROM documents
       WHERE doc_id NOT IN (SELECT doc_id FROM flagged)"""

  /** LSH candidates verified by exact shingle Jaccard. */
  def nearDupPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.nearDuplicatePairs(t(dir, "documents")(spark), "doc_id", "text", threshold = 0.8)

  val nearDupPairsSql: String =
    s"""WITH cand AS ($lshCandidatePairsSql),
       docs AS (SELECT * FROM $SqlShingleDocs)
       SELECT id_a, id_b, jaccard FROM (
         SELECT id_a, id_b,
                round(cast(len(list_filter(a.sh, x -> list_contains(b.sh, x))) as double)
                      / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1), 4) AS jaccard
         FROM cand JOIN docs a ON cand.id_a = a.doc_id JOIN docs b ON cand.id_b = b.doc_id)
       WHERE jaccard >= 0.8"""

  /** Duplicate clusters: connected components over verified near-dup pairs. */
  def dupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.nearDuplicatePairs(t(dir, "documents")(spark), "doc_id", "text", threshold = 0.8)
    Dedup.duplicateClusters(pairs)
  }

  /**
   * Rounds of min-label propagation the cluster ORACLES unroll. Spark's
   * [[Dedup.duplicateClusters]] pointer-jumps to convergence; plain
   * (non-jumping) propagation unrolled `n` rounds matches it only for
   * components of diameter <= n. Every oracle built on [[dupClusterCtes]]
   * — `dup_clusters` AND `leakage_safe_split`, whose split assignment
   * rides the cluster label — inherits this assumption.
   * DedupSpec("oracle label-propagation depth covers the corpus") asserts
   * the test corpus's true max cluster diameter stays within it.
   */
  val OracleLabelPropRounds: Int = 6

  /**
   * Oracle twin of [[Dedup.duplicateClusters]]: [[OracleLabelPropRounds]]
   * fixed rounds of min-label propagation — covers any component of
   * diameter <= that bound, far beyond real dup-cluster shapes.
   * Shared CTE chain ending in `l6(id, cluster_id)` — reused by the split oracle.
   */
  private val dupClusterCtes: String = {
    val rounds = (1 to OracleLabelPropRounds).map { k =>
      s"""l$k AS (SELECT id, min(cluster_id) AS cluster_id FROM (
            SELECT id, cluster_id FROM l${k - 1}
            UNION ALL
            SELECT e.src AS id, l.cluster_id FROM edges e JOIN l${k - 1} l ON e.dst = l.id
          ) GROUP BY id)"""
    }.mkString(",\n       ")
    s"""pairs AS ($nearDupPairsSql),
       edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                 UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
       l0 AS (SELECT DISTINCT src AS id, src AS cluster_id FROM edges),
       $rounds"""
  }

  val dupClustersSql: String =
    s"""WITH $dupClusterCtes
       SELECT id, cluster_id FROM l$OracleLabelPropRounds"""

  /**
   * Leakage-safe split: every document keyed to its near-dup cluster
   * representative, split by the group's hash bucket — near-copies can
   * never straddle train/test ([[Dedup.leakageSafeSplit]]). The oracle's
   * cluster labels come from [[dupClusterCtes]] and are therefore exact
   * only for components of diameter <= [[OracleLabelPropRounds]] (see its
   * doc; the corpus-diameter spec guards the assumption).
   */
  def leakageSafeSplitQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    Dedup.leakageSafeSplit(t(dir, "documents"), "doc_id", "text",
      Seq("train" -> 80, "valid" -> 10, "test" -> 10), threshold = 0.8)
      .select(col("doc_id"), col("group_id"), col("split"))
  }

  val leakageSafeSplitSql: String = {
    val bucket = sqlHashBucket("group_id")
    s"""WITH $dupClusterCtes,
       groups AS (
         SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS group_id
         FROM documents d LEFT JOIN l$OracleLabelPropRounds l ON d.doc_id = l.id)
       SELECT doc_id, group_id,
              CASE WHEN $bucket * 100 < 80 * 65536 THEN 'train'
                   WHEN $bucket * 100 < 90 * 65536 THEN 'valid'
                   ELSE 'test' END AS split
       FROM groups"""
  }

  /**
   * Keep-best near-dedup: per near-dup cluster the highest-`n_chars`
   * member survives (ties -> smallest id), unclustered docs always do
   * ([[Dedup.removeNearDuplicatesKeepBest]] — the curation variant of
   * near-dup removal). Cluster oracle inherits the
   * [[OracleLabelPropRounds]] assumption via [[dupClusterCtes]].
   */
  def nearDedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    Dedup.removeNearDuplicatesKeepBest(t(dir, "documents"), "doc_id", "text",
      "n_chars", threshold = 0.8)
      .select(col("doc_id"), col("n_chars"))
  }

  val nearDedupKeepBestSql: String =
    s"""WITH $dupClusterCtes,
       scored AS (
         SELECT l.id, l.cluster_id, d.n_chars
         FROM l$OracleLabelPropRounds l JOIN documents d ON d.doc_id = l.id),
       keepers AS (
         SELECT id FROM (
           SELECT id, row_number() OVER (PARTITION BY cluster_id
             ORDER BY (n_chars IS NULL), n_chars DESC, id) AS rn
           FROM scored) WHERE rn = 1),
       losers AS (
         SELECT id FROM l$OracleLabelPropRounds
         WHERE id NOT IN (SELECT id FROM keepers))
       SELECT doc_id, n_chars FROM documents
       WHERE doc_id NOT IN (SELECT id FROM losers)"""

  /** Multiprobe LSH ANN: probe own + Hamming-1 buckets, exact rerank. */
  def annMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val emb = t(dir, "embeddings")
    Similarity.annTopKMultiprobe(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
      k = 5, nbits = 8)
  }

  val annMultiprobeSql: String =
    s"""WITH bucketed AS (
         SELECT vec_id, embedding, cast(${sqlLshBucket("embedding")} as bigint) AS bucket
         FROM embeddings),
       probes AS (
         SELECT vec_id AS query_id, embedding AS qv,
                unnest(list_concat(list_transform(range(0, 8), i -> xor(bucket, (1::BIGINT << i))),
                                   [bucket])) AS bucket
         FROM bucketed WHERE vec_id < 5),
       cand AS (
         SELECT p.query_id, c.vec_id AS neighbor_id, p.qv AS qv, c.embedding AS nv
         FROM probes p JOIN bucketed c USING (bucket)
         WHERE p.query_id <> c.vec_id),
       scored AS (
         SELECT DISTINCT query_id, neighbor_id, $SqlCos AS cosine FROM cand)
       SELECT query_id, neighbor_id, cosine, rank FROM (
         SELECT query_id, neighbor_id, cosine,
                row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
         FROM scored)
       WHERE rank <= 5"""

  /** 32-bit SimHash fingerprints (per-row, portable md5 bit parity). */
  def simhashFingerprints(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "documents").select(col("doc_id"), Dedup.simhash32(col("text")).as("simhash"))
  }

  val simhashFingerprintsSql: String = {
    val terms = (1 to 32).map { j =>
      val w = 1L << (j - 1)
      s"(CASE WHEN coalesce(list_sum(list_transform(toks, t -> ((strpos('0123456789abcdef', substring(md5(t), $j, 1)) - 1) % 2) * 2 - 1)), 0) > 0 THEN $w ELSE 0 END)"
    }.mkString(" + ")
    s"""SELECT doc_id, cast($terms as bigint) AS simhash
       FROM (SELECT doc_id, $Toks AS toks FROM documents)"""
  }

  /** SimHash 16-bit-band near-dup pairs (exact recall for Hamming <= 3). */
  def simhashNeardup(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDupPairs(t(dir, "documents")(spark), "doc_id", "text", maxHamming = 3)

  /** DuckDB twin of [[Dedup.simhash64]]: bit j = bit j%4 of md5 hex digit j/4. */
  private val SqlSimhash64: String = {
    val terms = (0 until 64).map { j =>
      val contrib = if (j == 63) "((-9223372036854775807)::BIGINT - 1)" else (1L << j).toString
      s"(CASE WHEN coalesce(list_sum(list_transform(toks, t -> (((strpos('0123456789abcdef', substring(md5(t), ${j / 4 + 1}, 1)) - 1) >> ${j % 4}) & 1) * 2 - 1)), 0) > 0 THEN $contrib ELSE 0 END)"
    }.mkString(" + ")
    s"cast($terms as bigint)"
  }

  val simhashNeardupSql: String =
    s"""WITH sh AS (SELECT doc_id, $SqlSimhash64 AS simhash
                    FROM (SELECT doc_id, $Toks AS toks FROM documents)),
       banded AS (SELECT doc_id, simhash, b.band, (simhash >> (b.band * 16)) & 65535 AS bb
                  FROM sh CROSS JOIN (SELECT unnest(range(0, 4)) AS band) b)
       SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
              cast(bit_count(xor(a.simhash, c.simhash)) as bigint) AS hamming
       FROM banded a JOIN banded c ON a.band = c.band AND a.bb = c.bb
       WHERE a.doc_id < c.doc_id AND bit_count(xor(a.simhash, c.simhash)) <= 3"""

  /**
   * Line-level boilerplate removal (C4-style). The word-soup corpus has no
   * newlines, so a deterministic footer line is appended to every 3rd doc
   * first; the op must strip the shared footer everywhere and empty out
   * fully-duplicated documents, preserving everything else in order.
   */
  def boilerplateLines(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val salted = t(dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit("\nSubscribe to our newsletter today")))
        .otherwise(col("text")).as("text"))
    TextAnalysis.removeBoilerplateLines(salted, "doc_id", "text", minDocs = 2)
      .select(col("doc_id"),
        when(length(col("text")) === 0, 0L)
          .otherwise(size(split(col("text"), "\n")).cast("long")).as("n_lines"),
        md5(col("text")).as("clean_fp"))
  }

  val boilerplateLinesSql: String = {
    val normLine = raw"md5(lower(trim(regexp_replace(line, '\s+', ' ', 'g'))))"
    s"""WITH salted AS (
         SELECT doc_id, CASE WHEN doc_id % 3 = 0
                THEN text || chr(10) || 'Subscribe to our newsletter today'
                ELSE text END AS text
         FROM documents),
       lines AS (
         SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
                unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
         FROM salted),
       norm AS (SELECT doc_id, pos, line, $normLine AS nfp FROM lines),
       bp AS (SELECT nfp FROM norm GROUP BY nfp HAVING count(DISTINCT doc_id) >= 2),
       rebuilt AS (
         SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
         FROM norm WHERE nfp NOT IN (SELECT nfp FROM bp)
         GROUP BY doc_id)
       SELECT d.doc_id,
              cast(coalesce(len(string_split(r.text, chr(10))), 0) as bigint) AS n_lines,
              md5(coalesce(r.text, '')) AS clean_fp
       FROM documents d LEFT JOIN rebuilt r USING (doc_id)"""
  }

  /**
   * Span-level exact substring dedup (Lee-et-al-style, word-window
   * granularity). The word-soup corpus has few organic repeated 8-grams, so
   * a fixed 12-token disclaimer is appended to every 4th doc first; the op
   * must keep the disclaimer's first corpus occurrence, strip it everywhere
   * else, and leave everything else byte-identical.
   */
  def spanDedup(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val disclaimer =
      " please subscribe to our newsletter for weekly updates and exclusive offers today"
    val salted = t(dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 4 === 0, concat(col("text"), lit(disclaimer)))
        .otherwise(col("text")).as("text"))
    Dedup.removeDuplicateSpans(salted, "doc_id", "text", w = 8)
      .select(col("doc_id"), col("n_tokens"), col("n_kept"),
        md5(col("clean_text")).as("clean_fp"))
  }

  val spanDedupSql: String = {
    s"""WITH salted AS (
         SELECT doc_id, CASE WHEN doc_id % 4 = 0
                THEN text || ' please subscribe to our newsletter for weekly updates and exclusive offers today'
                ELSE text END AS text
         FROM documents),
       toks AS (SELECT doc_id, $Toks AS toks FROM salted),
       tokpos AS (
         SELECT doc_id, unnest(range(1, len(toks) + 1)) AS tp, unnest(toks) AS tok
         FROM toks),
       wins AS (
         SELECT doc_id, pos, md5(array_to_string(toks[pos:pos+7], ' ')) AS h
         FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS pos
               FROM toks WHERE len(toks) >= 8)),
       dup AS (
         SELECT doc_id, pos FROM (
           SELECT doc_id, pos, row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
           FROM wins)
         WHERE rn > 1),
       covered AS (
         SELECT DISTINCT doc_id, pos + g AS tp
         FROM dup CROSS JOIN (SELECT unnest(range(0, 8)) AS g) offs),
       kept AS (
         SELECT t.doc_id, t.tp, t.tok
         FROM tokpos t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.tp = c.tp
         WHERE c.tp IS NULL),
       rebuilt AS (
         SELECT doc_id, count(*) AS n_kept,
                md5(string_agg(tok, ' ' ORDER BY tp)) AS clean_fp
         FROM kept GROUP BY doc_id)
       SELECT d.doc_id, cast(len(d.toks) as bigint) AS n_tokens,
              cast(coalesce(r.n_kept, 0) as bigint) AS n_kept,
              coalesce(r.clean_fp, md5('')) AS clean_fp
       FROM toks d LEFT JOIN rebuilt r USING (doc_id)"""
  }

  /**
   * Bloom-accelerated incremental dedup: docs whose fingerprint is in the
   * "store" (every 3rd doc stands in for past days) are dropped; the bloom
   * scalar subquery short-circuits the definitely-new rows around the anti
   * join. The bloom path is approximate but one-sided, and the exact anti
   * join re-verifies, so the oracle is the plain NOT EXISTS.
   */
  def dedupIncrementalBloom(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
    val store = docs.filter(col("doc_id") % 3 === 0).select(col("fp"))
    ops.Bloom.antiJoinWithBloom(docs, store, "fp").select(col("doc_id"), col("fp"))
  }

  val dedupIncrementalBloomSql: String =
    s"""WITH fps AS (SELECT doc_id, md5($Norm) AS fp FROM documents),
       store AS (SELECT fp FROM fps WHERE doc_id % 3 = 0)
       SELECT doc_id, fp FROM fps
       WHERE NOT EXISTS (SELECT 1 FROM store s WHERE s.fp = fps.fp)"""

  /** Deterministic hash-based train/valid/test split, counted per language. */
  def hashSplitCounts(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "documents")
      .select(TextAnalysis.hashSplit(col("doc_id"),
        Seq("train" -> 80, "valid" -> 10, "test" -> 10)).as("split"), col("lang"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n"))
  }

  val hashSplitCountsSql: String = {
    val bucket = sqlHashBucket("doc_id")
    s"""SELECT split, lang, count(*) AS n FROM (
       SELECT lang, CASE WHEN $bucket * 100 < 80 * 65536 THEN 'train'
                         WHEN $bucket * 100 < 90 * 65536 THEN 'valid'
                         ELSE 'test' END AS split
       FROM documents)
       GROUP BY split, lang"""
  }

  /** Quality-scoring stats; pure codegen'd column math. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val stats = TextAnalysis.qualityStats(col("text")).map {
      case (n @ ("n_chars" | "n_tokens"), c) => c.cast("long").as(n)
      case (name, c) => c.as(name)
    }
    t(dir, "documents").select(col("doc_id") +: stats: _*)
  }

  /** Fixed demo weights for the `quality_score` battery query — shaped
    * like a trained prose-vs-junk model (reward stopwords/diversity/word
    * length, punish punctuation and digit soup), shared with the oracle. */
  private val QualityWeights: Seq[(String, Long)] = Seq(
    "stopword_ppm" -> 3L, "distinct_ppm" -> 1L, "mean_word_len_x100" -> 5L,
    "punct_ppm" -> -2L, "digit_ppm" -> -1L)

  /**
   * `quality_score`: [[TextAnalysis.qualityLinearScore]] — the serving
   * side of a trained linear quality classifier, every feature and the
   * score exact BIGINT so the model replays bit-identically in DuckDB.
   */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val feats = TextAnalysis.qualityFeatures(col("text")).map { case (n, c) => c.as(n) }
    t(dir, "documents").select(
      (col("doc_id") +: feats) :+
        TextAnalysis.qualityLinearScore(col("text"), QualityWeights.toMap)
          .as("quality_score"): _*)
  }

  val qualityScoreSql: String = {
    val stop = TextAnalysis.StopwordProfiles("en").map(w => s"'$w'").mkString(", ")
    val terms = QualityWeights.sortBy(_._1)
      .map { case (n, w) => s"($w) * $n" }.mkString(" + ")
    s"""SELECT doc_id, n_chars, n_tokens, punct_ppm, digit_ppm, stopword_ppm,
              distinct_ppm, mean_word_len_x100,
              cast(0 + $terms as bigint) AS quality_score
       FROM (SELECT doc_id,
               cast(length(text) as bigint) AS n_chars,
               cast(len(toks) as bigint) AS n_tokens,
               cast((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) * 1000000 // greatest(length(text), 1) as bigint) AS punct_ppm,
               cast((length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 1000000 // greatest(length(text), 1) as bigint) AS digit_ppm,
               cast(coalesce(list_sum(list_transform(toks, t -> CASE WHEN t IN ($stop) THEN 1 ELSE 0 END)), 0) * 1000000 // greatest(len(toks), 1) as bigint) AS stopword_ppm,
               cast(len(list_distinct(toks)) * 1000000 // greatest(len(toks), 1) as bigint) AS distinct_ppm,
               cast(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) * 100 // greatest(len(toks), 1) as bigint) AS mean_word_len_x100
             FROM (SELECT doc_id, text, $Toks AS toks FROM documents))"""
  }

  val textQualitySql: String = {
    val stop = TextAnalysis.StopwordProfiles("en").map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       cast(length(text) as bigint) AS n_chars,
       cast(len(toks) as bigint) AS n_tokens,
       round((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) / cast(greatest(length(text), 1) as double), 4) AS punct_ratio,
       round(coalesce(list_sum(list_transform(toks, t -> CASE WHEN t IN ($stop) THEN 1 ELSE 0 END)), 0) / cast(greatest(len(toks), 1) as double), 4) AS stopword_ratio,
       round(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) / cast(greatest(len(toks), 1) as double), 4) AS mean_word_len
       FROM (SELECT doc_id, text, $Toks AS toks FROM documents)"""
  }

  /** Stopword-profile language ID. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "documents").select(col("doc_id"), TextAnalysis.languageId(col("text")).as("lang_pred"))
  }

  val langIdSql: String = {
    // mirrors TextAnalysis.languageId stage for stage, generated from the
    // same constants: script-count argmax pre-filter (ranges are \x{...}
    // escapes that parse identically in RE2), kana-share ja/zh rule, then
    // the stopword argmax when Latin wins
    val scriptCols = TextAnalysis.ScriptRanges.map { case (s, r) =>
      s"length(text) - length(regexp_replace(text, '[$r]', '', 'g')) AS c_$s"
    }.mkString(",\n         ")
    val bestScript = s"greatest(${TextAnalysis.ScriptRanges.map("c_" + _._1).mkString(", ")})"
    val ordered = TextAnalysis.StopwordProfiles.toSeq.sortBy(_._1)
    val scores = ordered.map { case (lang, words) =>
      val set = words.map(w => s"'$w'").mkString(", ")
      lang -> s"coalesce(list_sum(list_transform(toks, t -> CASE WHEN t IN ($set) THEN 1 ELSE 0 END)), 0)"
    }
    val scoreCols = scores.map { case (lang, e) => s"$e AS s_$lang" }.mkString(",\n         ")
    val bestStop = s"greatest(${scores.map(p => "s_" + p._1).mkString(", ")})"
    val stopPick = scores.map { case (lang, _) => s"WHEN s_$lang = bests AND bests > 0 THEN '$lang'" }
      .mkString(" ")
    val cjk = "CASE WHEN c_kana * 20 >= c_kana + c_hani THEN 'ja' ELSE 'zh' END"
    val scriptPick = TextAnalysis.ScriptRanges.map { case (s, _) =>
      val v = s match {
        case "latn" => s"(CASE $stopPick ELSE 'und' END)"
        case "hani" | "kana" => s"($cjk)"
        case other => s"'${TextAnalysis.ScriptLang(other)}'"
      }
      s"WHEN c_$s = bestc AND bestc > 0 THEN $v"
    }.mkString(" ")
    s"""SELECT doc_id, CASE $scriptPick ELSE 'und' END AS lang_pred
       FROM (SELECT doc_id, $bestScript AS bestc, $bestStop AS bests, * FROM (
         SELECT doc_id,
         $scriptCols,
         $scoreCols
         FROM (SELECT doc_id, text, $Toks AS toks FROM documents)))"""
  }

  /**
   * PII scrubbing: the word-soup test corpus has no PII, so deterministic
   * synthetic PII is appended to every 5th doc before scrubbing — the
   * redaction, detection flag and scrubbed fingerprint are all checked.
   */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val salted = when(col("doc_id") % 5 === 0,
      concat(col("text"), lit(" contact user"), col("doc_id"), lit("@example.com or +1 555 010 "),
        col("doc_id"), lit(" at 10.0.0."), col("doc_id") % 255))
      .otherwise(col("text"))
    t(dir, "documents")
      .select(col("doc_id"), salted.as("salted"))
      .select(col("doc_id"),
        TextAnalysis.hasPii(col("salted")).cast("long").as("has_pii"),
        md5(TextAnalysis.scrubPii(col("salted"))).as("scrubbed_fp"))
  }

  /**
   * `html_extract`: [[TextAnalysis.htmlToText]] over a deterministic HTML
   * page built around each document's text — a head whose style/script
   * blocks contain raw `<`/`>` operators that MUST vanish with the block,
   * a comment, a noscript fallback, markup tags, and an entity-laden
   * footer (incl. a double-encoded `&amp;lt;` that must resolve to the
   * literal `&lt;`). The oracle rebuilds the same page and runs the same
   * engine-portable strip/decode/fold chain in DuckDB (RE2).
   */
  private val HtmlHead: String =
    "<html><head><title>Doc</title><style media=\"all\">p { color: #333; }</style>" +
      "<script type=\"text/javascript\">if (1 < 2 && 2 > 1) { emit(\"x\"); }</script>" +
      "</head><body><!-- header --><noscript>enable js</noscript><h1>Entry</h1><p class=\"lead\">"
  private val HtmlTail: String =
    "</p>  <p>Tom &amp; Jerry &lt;3&nbsp;end &quot;quoted&quot; it&#39;s &amp;lt;raw</p></body></html>"

  def htmlExtract(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "documents").select(col("doc_id"),
      TextAnalysis.htmlToText(concat(lit(HtmlHead), col("text"), lit(HtmlTail))).as("text"))
  }

  val htmlExtractSql: String = {
    def q(s: String) = s.replace("'", "''")
    val wrapped = s"'${q(HtmlHead)}' || text || '${q(HtmlTail)}'"
    val untagged = TextAnalysis.HtmlStripPatterns.foldLeft("wrapped") { (c, p) =>
      s"regexp_replace($c, '${q(p)}', ' ', 'g')"
    }
    val decoded = TextAnalysis.HtmlEntities.foldLeft(untagged) { case (c, (e, r)) =>
      s"replace($c, '${q(e)}', '${q(r)}')"
    }
    s"""SELECT doc_id,
       trim(regexp_replace($decoded, '${q(TextAnalysis.HtmlWhitespacePattern)}', ' ', 'g')) AS text
       FROM (SELECT doc_id, $wrapped AS wrapped FROM documents)"""
  }

  /**
   * `main_content`: [[TextAnalysis.mainContentBlocks]] over a nav-heavy
   * page built around each document's text — a linky nav menu, a
   * link-saturated sidebar that clears the word floor (link density must
   * kill it), a plain 3-word share bar (the word floor must kill it), the
   * article body, a tag cloud and a linky footer. Only the article text
   * may survive; the oracle replays the same block-split / link-density /
   * word-floor chain in DuckDB (RE2).
   */
  private val NavHead: String =
    "<html><head><title>T</title><style>a { color: red; }</style></head><body>" +
      "<nav><ul><li><a href=\"/\">Home</a></li><li><a href=\"/about\">About us</a></li>" +
      "<li><a href=\"/contact\">Contact</a></li></ul></nav>" +
      "<div id=\"side\"><a href=\"/r1\">Related article one</a> <a href=\"/r2\">Related two</a></div>" +
      "<p>Share this page</p><article><p class=\"body\">"
  private val NavTail: String =
    "</p></article><div class=\"tags\"><a href=\"/t/a\">alpha</a> <a href=\"/t/b\">beta</a>" +
      " <a href=\"/t/c\">gamma</a></div>" +
      "<footer><a href=\"/tos\">Terms of service</a> | <a href=\"/priv\">Privacy policy</a>" +
      " &copy; 2026 Example</footer></body></html>"

  def mainContentQuery(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val page = concat(lit(NavHead), col("text"), lit(NavTail))
    t(dir, "documents").select(col("doc_id"),
      size(TextAnalysis.mainContentBlocks(page)).cast("long").as("n_kept"),
      md5(TextAnalysis.mainContent(page)).as("main_fp"))
  }

  val mainContentSql: String = {
    def q(s: String) = s.replace("'", "''")
    val wrapped = s"'${q(NavHead)}' || text || '${q(NavTail)}'"
    val pre = TextAnalysis.HtmlStripPatterns.dropRight(1).foldLeft("page") { (c, p) =>
      s"regexp_replace($c, '${q(p)}', ' ', 'g')"
    }
    def clean(e: String) = {
      val untag = s"regexp_replace($e, '<[^>]*>', ' ', 'g')"
      val dec = TextAnalysis.HtmlEntities.foldLeft(untag) { case (c, (en, r)) =>
        s"replace($c, '${q(en)}', '${q(r)}')"
      }
      s"trim(regexp_replace($dec, '${q(TextAnalysis.HtmlWhitespacePattern)}', ' ', 'g'))"
    }
    val words = s"len(list_filter(string_split(${clean("b")}, ' '), w -> w <> ''))"
    // coalesce: DuckDB's array_to_string returns NULL (not '') for an
    // empty extract list inside a lambda — an anchor-free block must score
    // link length 0, as Spark's array_join does
    val linkText = clean(
      s"coalesce(array_to_string(regexp_extract_all(b, '${q(TextAnalysis.AnchorPattern)}', 1), ' '), '')")
    s"""WITH pages AS (SELECT doc_id, $wrapped AS page FROM documents),
       blocks AS (SELECT doc_id,
           string_split_regex($pre, '${q(TextAnalysis.BlockTagPattern)}') AS bs
         FROM pages),
       kept AS (SELECT doc_id,
           list_filter(bs, b ->
             $words >= 5 AND len($linkText) * 100 <= len(${clean("b")}) * 33) AS ks
         FROM blocks)
       SELECT doc_id, cast(len(ks) as bigint) AS n_kept,
         md5(array_to_string(list_transform(ks, b -> ${clean("b")}), chr(10))) AS main_fp
       FROM kept"""
  }

  /**
   * `intra_doc_dedup`: [[TextAnalysis.dedupLinesInDoc]] over a synthetic
   * page that repeats a nav header and footer line around each document's
   * text (the word-soup corpus is single-line) — first occurrences
   * survive in order, repeats drop, and the removed-line count is exact.
   * Oracle: the same first-occurrence index filter via DuckDB list
   * lambdas (1-based there, 0-based in Spark — both compared to the
   * 1-based first-position).
   */
  def intraDocDedup(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val header = concat(lit("NAV "), col("source"))
    val page = concat_ws("\n",
      header, col("text"), header, lit("contact us"), header, lit("contact us"))
    t(dir, "documents").select(col("doc_id"), page.as("page"))
      .select(col("doc_id"),
        TextAnalysis.dedupLinesInDoc(col("page")).as("clean_text"),
        (size(split(col("page"), "\n")) -
          size(split(TextAnalysis.dedupLinesInDoc(col("page")), "\n"))).cast("long")
          .as("n_removed"))
  }

  val intraDocDedupSql: String = {
    val dedup = "list_filter(string_split(page, chr(10)), " +
      "(l, i) -> list_position(string_split(page, chr(10)), l) = i)"
    s"""SELECT doc_id,
       array_to_string($dedup, chr(10)) AS clean_text,
       CAST(len(string_split(page, chr(10))) - len($dedup) AS BIGINT) AS n_removed
       FROM (SELECT doc_id,
               'NAV ' || source || chr(10) || text || chr(10) || 'NAV ' || source ||
                 chr(10) || 'contact us' || chr(10) || 'NAV ' || source || chr(10) || 'contact us' AS page
             FROM documents)"""
  }

  /**
   * `url_profile`: the [[Web]] URL toolkit over deterministic synthetic
   * URLs (the word-soup corpus has no URL column) — five shapes per
   * `doc_id % 5` exercise mixed-case schemes/hosts, default ports,
   * co.uk-style second-level domains, hosting-platform private suffixes
   * (`<user>.blogspot.com` keeps its user label), tracking params,
   * fragments, schemeless hosts and root slashes. The oracle rebuilds the
   * same URLs and mirrors every chain stage for stage in DuckDB (RE2).
   */
  def urlProfile(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val id = col("doc_id").cast("string")
    val url = when(col("doc_id") % 5 === 0,
      concat(lit("HTTPS://WWW."), col("source"), lit(".Example.CO.UK:443/Articles/"), id,
        lit("?utm_source=feed&ref="), col("lang"), lit("#sec2")))
      .when(col("doc_id") % 5 === 1,
        concat(lit("http://blog."), col("source"), lit(".com:80/post/"), id,
          lit("?id="), id, lit("&utm_campaign=x&gclid=abc")))
      .when(col("doc_id") % 5 === 2, concat(col("source"), lit(".org/data/"), id))
      .when(col("doc_id") % 5 === 3,
        concat(lit("https://"), col("source"), col("lang"), lit(".blogspot.com/"), id))
      .otherwise(concat(lit("https://cdn."), col("source"), lit(".net/")))
    t(dir, "documents").select(col("doc_id"), url.as("url"))
      .select(col("doc_id"), col("url"),
        Web.urlHost(col("url")).as("host"),
        Web.urlDomain(col("url")).as("domain"),
        Web.normalizeUrl(col("url")).as("norm_url"))
  }

  val urlProfileSql: String = {
    val urlCase = "CASE doc_id % 5" +
      " WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.CO.UK:443/Articles/' || doc_id || '?utm_source=feed&ref=' || lang || '#sec2'" +
      " WHEN 1 THEN 'http://blog.' || source || '.com:80/post/' || doc_id || '?id=' || doc_id || '&utm_campaign=x&gclid=abc'" +
      " WHEN 2 THEN source || '.org/data/' || doc_id" +
      " WHEN 3 THEN 'https://' || source || lang || '.blogspot.com/' || doc_id" +
      " ELSE 'https://cdn.' || source || '.net/' END"
    val sll = graft.ops.Web.SecondLevelLabels.map(l => s"'$l'").mkString(", ")
    val privs = graft.ops.Web.PrivateSuffixes.map(l => s"'$l'").mkString(", ")
    // base registrable (ccTLD-aware), then the private-suffix widening:
    // when the base lands on a hosting platform, keep one more label
    val baseLen = s"CASE WHEN len(labels) <= 2 THEN len(labels)" +
      s" WHEN length(labels[-1]) = 2 AND labels[-2] IN ($sll) THEN 3 ELSE 2 END"
    val base = s"CASE WHEN len(labels) <= 2 THEN host" +
      s" ELSE array_to_string(list_slice(labels, len(labels) - ($baseLen) + 1, len(labels)), '.') END"
    s"""SELECT doc_id, url, host,
       CASE WHEN ($base) IN ($privs) AND len(labels) > ($baseLen)
              THEN array_to_string(list_slice(labels, len(labels) - ($baseLen), len(labels)), '.')
            ELSE ($base) END AS domain,
       sch || '://' || nhost || (CASE WHEN path0 = '/' THEN '' ELSE path0 END) ||
         (CASE WHEN qc = '' THEN '' ELSE '?' || qc END) AS norm_url
       FROM (SELECT doc_id, url, sch, host, nhost, path0, string_split(host, '.') AS labels,
               trim(regexp_replace('&' || q0 || '&', '&(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&]*', '', 'g'), '&') AS qc
             FROM (SELECT doc_id, url,
                     lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
                     lower(regexp_replace(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), ':[0-9]+${"$"}', '', 'g')) AS host,
                     lower(regexp_replace(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), ':(80|443)${"$"}', '', 'g')) AS nhost,
                     regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
                     regexp_extract(u, '\\?([^#]*)', 1) AS q0
                   FROM (SELECT doc_id, url,
                           regexp_replace(CASE WHEN regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN url ELSE 'http://' || url END, '#.*', '', 'g') AS u
                         FROM (SELECT doc_id, $urlCase AS url FROM documents))))"""
  }

  /**
   * `url_dedup`: [[Web.dedupByUrl]] — the cheapest dedup tier of a crawl
   * pipeline: canonical-URL keep-first over deterministic synthetic URL
   * variants. Docs sharing a `(site, page)` pair under variants 0-2
   * (default port + mixed case / tracking params / schemeless + fragment)
   * collapse to one canonical URL; variant 3 carries a real `ref=keep`
   * param and stays its own group; `doc_id % 10 == 7` rows have NO url
   * and pass through untouched. Oracle replays the same canonicalization
   * chain and a `row_number` keep-first in DuckDB.
   */
  def urlDedup(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val site = (col("doc_id") % 5).cast("string")
    val page = (col("doc_id") % 50).cast("string")
    val url = when(col("doc_id") % 10 === 7, lit(null).cast("string"))
      .when(col("doc_id") % 4 === 0,
        concat(lit("HTTP://WWW.Site"), site, lit(".COM:80/Page/"), page))
      .when(col("doc_id") % 4 === 1,
        concat(lit("http://www.site"), site, lit(".com/Page/"), page,
          lit("?utm_source=feed&utm_id=9")))
      .when(col("doc_id") % 4 === 2,
        concat(lit("www.site"), site, lit(".com/Page/"), page, lit("#section")))
      .otherwise(concat(lit("http://www.site"), site, lit(".com/Page/"), page,
        lit("?ref=keep")))
    val docs = t(dir, "documents").select(col("doc_id"), url.as("url"))
    Web.dedupByUrl(docs, "url", "doc_id")
      .select(col("doc_id"), Web.normalizeUrl(col("url")).as("canon_url"))
  }

  val urlDedupSql: String = {
    val urlCase = "CASE WHEN doc_id % 10 = 7 THEN NULL" +
      " WHEN doc_id % 4 = 0 THEN 'HTTP://WWW.Site' || (doc_id % 5) || '.COM:80/Page/' || (doc_id % 50)" +
      " WHEN doc_id % 4 = 1 THEN 'http://www.site' || (doc_id % 5) || '.com/Page/' || (doc_id % 50) || '?utm_source=feed&utm_id=9'" +
      " WHEN doc_id % 4 = 2 THEN 'www.site' || (doc_id % 5) || '.com/Page/' || (doc_id % 50) || '#section'" +
      " ELSE 'http://www.site' || (doc_id % 5) || '.com/Page/' || (doc_id % 50) || '?ref=keep' END"
    s"""WITH urls AS (SELECT doc_id, $urlCase AS url FROM documents),
       canon AS (
         SELECT doc_id,
           sch || '://' || nhost || (CASE WHEN path0 = '/' THEN '' ELSE path0 END) ||
             (CASE WHEN qc = '' THEN '' ELSE '?' || qc END) AS canon_url
         FROM (SELECT doc_id, sch, nhost, path0,
                 trim(regexp_replace('&' || q0 || '&', '&(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&]*', '', 'g'), '&') AS qc
               FROM (SELECT doc_id,
                       lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
                       lower(regexp_replace(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), ':(80|443)${"$"}', '', 'g')) AS nhost,
                       regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
                       regexp_extract(u, '\\?([^#]*)', 1) AS q0
                     FROM (SELECT doc_id,
                             regexp_replace(CASE WHEN regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN url ELSE 'http://' || url END, '#.*', '', 'g') AS u
                           FROM urls WHERE url IS NOT NULL))))
       SELECT doc_id, canon_url FROM (
         SELECT doc_id, canon_url,
                row_number() OVER (PARTITION BY canon_url ORDER BY doc_id) AS rn
         FROM canon) WHERE rn = 1
       UNION ALL
       SELECT doc_id, NULL AS canon_url FROM urls WHERE url IS NULL"""
  }

  /**
   * `domain_quality`: [[Web.domainQualityProfile]] per source — exact
   * integer-ppm punctuation and Gopher-gate-failure shares, the
   * measurement pass behind a domain blocklist. Oracle replays the same
   * per-doc flags (quality_filter's inner SQL) and the same HUGEINT
   * cross-multiplied shares.
   */
  def domainQuality(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    Web.domainQualityProfile(t(dir, "documents"), "source", "text")
  }

  val domainQualitySql: String =
    s"""SELECT domain, n_docs, punct_ppm, gate_fail_ppm,
       cast(CASE WHEN punct_ppm > 200000 OR gate_fail_ppm > 500000 THEN 1 ELSE 0 END AS BIGINT) AS low_quality
       FROM (SELECT source AS domain, cast(count(*) AS BIGINT) AS n_docs,
               CAST(CAST(sum(punct) AS HUGEINT) * 1000000 // greatest(sum(chars), 1) AS BIGINT) AS punct_ppm,
               CAST(CAST(sum(1 - passes) AS HUGEINT) * 1000000 // count(*) AS BIGINT) AS gate_fail_ppm
             FROM (SELECT source, length(text) AS chars,
                     (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) AS punct,
                     (CASE WHEN len(toks) >= 5 AND len(toks) <= 100000 THEN 1 ELSE 0 END)
                     * (CASE WHEN mean_len >= 2.0 AND mean_len <= 12.0 THEN 1 ELSE 0 END)
                     * (CASE WHEN symbol_ratio <= 0.2 THEN 1 ELSE 0 END)
                     * (CASE WHEN distinct_ratio >= 0.2 THEN 1 ELSE 0 END) AS passes
                   FROM (SELECT source, text,
                           coalesce(list_sum(list_transform(toks, t -> length(t))), 0) / cast(greatest(len(toks), 1) as double) AS mean_len,
                           (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) / cast(greatest(length(text), 1) as double) AS symbol_ratio,
                           len(list_distinct(toks)) / cast(greatest(len(toks), 1) as double) AS distinct_ratio,
                           toks
                         FROM (SELECT source, text, $Toks AS toks FROM documents)))
             GROUP BY source)"""

  val piiScrubSql: String = {
    val salted = "CASE WHEN doc_id % 5 = 0 THEN text || ' contact user' || doc_id || " +
      "'@example.com or +1 555 010 ' || doc_id || ' at 10.0.0.' || (doc_id % 255) ELSE text END"
    // DuckDB single-quoted strings are not C-escaped: backslashes pass through verbatim
    val scrubbed = TextAnalysis.PiiPatterns.foldLeft("salted") { case (c, (kind, p)) =>
      s"regexp_replace($c, '${p.replace("'", "''")}', '<${kind.toUpperCase}>', 'g')"
    }
    val any = TextAnalysis.PiiPatterns
      .map { case (_, p) => s"CASE WHEN regexp_matches(salted, '${p.replace("'", "''")}') THEN 1 ELSE 0 END" }
      .mkString(" + ")
    s"""SELECT doc_id, cast(CASE WHEN ($any) > 0 THEN 1 ELSE 0 END as bigint) AS has_pii,
       md5($scrubbed) AS scrubbed_fp
       FROM (SELECT doc_id, $salted AS salted FROM documents)"""
  }

  /** Gopher-style quality gate flags per document. */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val flags = TextAnalysis.qualityFlags(col("text")).map { case (n, c) => c.as(n) }
    t(dir, "documents").select(col("doc_id") +: flags: _*)
  }

  val qualityFilterSql: String =
    s"""SELECT doc_id,
       cast(CASE WHEN n_tokens >= 5 AND n_tokens <= 100000 THEN 1 ELSE 0 END as bigint) AS ok_word_count,
       cast(CASE WHEN mean_len >= 2.0 AND mean_len <= 12.0 THEN 1 ELSE 0 END as bigint) AS ok_mean_word_len,
       cast(CASE WHEN symbol_ratio <= 0.2 THEN 1 ELSE 0 END as bigint) AS ok_symbol_ratio,
       cast(CASE WHEN distinct_ratio >= 0.2 THEN 1 ELSE 0 END as bigint) AS ok_distinct_ratio,
       cast((CASE WHEN n_tokens >= 5 AND n_tokens <= 100000 THEN 1 ELSE 0 END)
         * (CASE WHEN mean_len >= 2.0 AND mean_len <= 12.0 THEN 1 ELSE 0 END)
         * (CASE WHEN symbol_ratio <= 0.2 THEN 1 ELSE 0 END)
         * (CASE WHEN distinct_ratio >= 0.2 THEN 1 ELSE 0 END) as bigint) AS passes
       FROM (SELECT doc_id,
               len(toks) AS n_tokens,
               coalesce(list_sum(list_transform(toks, t -> length(t))), 0) / cast(greatest(len(toks), 1) as double) AS mean_len,
               (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) / cast(greatest(length(text), 1) as double) AS symbol_ratio,
               len(list_distinct(toks)) / cast(greatest(len(toks), 1) as double) AS distinct_ratio
             FROM (SELECT doc_id, text, $Toks AS toks FROM documents))"""

  // Deterministic transliteration alphabets for `cjk_token_stats`: the
  // synthetic corpus is ASCII word soup even in its "zh" rows, so the query
  // builds REAL Han/kana/Thai pages from it with translate() — char-for-char
  // with identical semantics in Spark and DuckDB — and the oracle replays
  // the same mapping. 26 chars each, aligned to a-z.
  private val CjkAz = "abcdefghijklmnopqrstuvwxyz"
  private val CjkHan = "的一是不了人我在有他这中大来上国个到说们为子和你地出"
  private val CjkJa = "あ学習模い型訓練う語言処理翻え訳文字列解お析構造か体"
  private val CjkTh = "กขฃคฅฆงจฉชซฌญฎฏฐฑฒณดตถทธนบ"

  /** The transliterated page: zh rows → Han, es rows → kana-laced Japanese,
    * de rows → Thai, everything else verbatim. Word boundaries (spaces)
    * survive translate, so segmentation runs end where words did. */
  private def cjkPage: Column =
    when(col("lang") === "zh", translate(col("text"), CjkAz, CjkHan))
      .when(col("lang") === "es", translate(col("text"), CjkAz, CjkJa))
      .when(col("lang") === "de", translate(col("text"), CjkAz, CjkTh))
      .otherwise(col("text"))

  /**
   * `cjk_token_stats`: the script-aware tokenizer
   * ([[TextAnalysis.scriptTokens]] — character bigrams for Han/kana/Thai,
   * word tokens elsewhere) and the script-aware Gopher gates
   * ([[TextAnalysis.qualityFlagsScriptAware]]) over a mixed-script corpus,
   * aggregated per language: document/token/token-char counts, exact
   * integer mean token length (x100), and the gate pass count. Under the
   * ASCII tokenizer every non-Latin page here would report ZERO tokens and
   * fail every gate; these stats prove the token ops measure CJK/Thai text.
   * Per-row codegen'd kernels + ONE map-side-combined aggregation — scan
   * speed at any corpus size.
   */
  def cjkTokenStats(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val toks = TextAnalysis.scriptTokens(cjkPage)
    val passes = TextAnalysis.qualityFlagsScriptAware(cjkPage)
      .collectFirst { case ("passes", c) => c }.get
    t(dir, "documents")
      .select(col("lang"),
        size(toks).cast("long").as("__n_tok"),
        aggregate(toks, lit(0L), (a, tk) => a + length(tk)).as("__tchars"),
        passes.as("__passes"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n_tok")).cast("long").as("n_tokens"),
        sum(col("__tchars")).cast("long").as("token_chars"),
        sum(col("__passes")).cast("long").as("n_pass"))
      .withColumn("mean_token_len_x100",
        expr("CAST(CAST(token_chars AS DECIMAL(38,0)) * 100 DIV greatest(n_tokens, 1) AS BIGINT)"))
  }

  /** DuckDB twin of [[TextAnalysis.scriptTokens]] over a `page` column. */
  private def sqlScriptToks: String = {
    val segCls = TextAnalysis.SegScriptRanges
    val wordCls = s"a-z0-9${TextAnalysis.NonAsciiWordRanges}"
    s"""flatten(list_transform(
       regexp_extract_all(translate(page, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '$CjkAz'),
         '[$wordCls]+|[$segCls]+'),
       r -> CASE WHEN regexp_matches(r, '^[$segCls]')
            THEN CASE WHEN length(r) = 1 THEN [r]
                 ELSE list_transform(range(1, length(r)), i -> substring(r, i, 2)) END
            ELSE [r] END))"""
  }

  /** DuckDB twin of [[cjkPage]]. */
  private def sqlCjkPage: String =
    s"""CASE WHEN lang = 'zh' THEN translate(text, '$CjkAz', '$CjkHan')
       WHEN lang = 'es' THEN translate(text, '$CjkAz', '$CjkJa')
       WHEN lang = 'de' THEN translate(text, '$CjkAz', '$CjkTh')
       ELSE text END"""

  val cjkTokenStatsSql: String = {
    val segCls = TextAnalysis.SegScriptRanges
    val wordCls = s"a-z0-9${TextAnalysis.NonAsciiWordRanges}"
    s"""WITH pages AS (
         SELECT lang, $sqlCjkPage AS page
         FROM documents),
       tok AS (SELECT lang, page, $sqlScriptToks AS toks FROM pages),
       feat AS (
         SELECT lang, len(toks) AS n_tok,
           coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS tchars,
           (length(page) - length(regexp_replace(page, '[^a-zA-Z0-9\\s$wordCls$segCls]', '', 'g'))) / cast(greatest(length(page), 1) as double) AS symbol_ratio,
           len(list_distinct(toks)) / cast(greatest(len(toks), 1) as double) AS distinct_ratio
         FROM tok),
       gated AS (
         SELECT lang, n_tok, tchars,
           (CASE WHEN n_tok >= 5 AND n_tok <= 100000 THEN 1 ELSE 0 END)
           * (CASE WHEN tchars / cast(greatest(n_tok, 1) as double) >= 2.0 AND tchars / cast(greatest(n_tok, 1) as double) <= 12.0 THEN 1 ELSE 0 END)
           * (CASE WHEN symbol_ratio <= 0.2 THEN 1 ELSE 0 END)
           * (CASE WHEN distinct_ratio >= 0.2 THEN 1 ELSE 0 END) AS passes
         FROM feat)
       SELECT lang, count(*) AS n_docs,
              cast(sum(n_tok) as bigint) AS n_tokens,
              cast(sum(tchars) as bigint) AS token_chars,
              cast(sum(passes) as bigint) AS n_pass,
              cast((sum(tchars) * 100) // greatest(sum(n_tok), 1) as bigint) AS mean_token_len_x100
       FROM gated GROUP BY lang"""
  }

  /**
   * `cjk_near_dup`: the WHOLE near-dedup pipeline — script tokens →
   * 5-gram shingles → 12-hash MinHash → 4-band LSH → exact Jaccard verify
   * — running script-aware over the transliterated mixed-script corpus
   * ([[cjkPage]]), against synthesized recrawls (every 13th page
   * reappears under `doc_id + 1000000` with a short Han suffix appended).
   * Under the ASCII tokenizer every CJK page would share ONE empty-shingle
   * signature and the pair set would be a full cross-product of the
   * language; script-aware, pairs are exactly the long-enough recrawls.
   * Oracle replays tokenization, hashing, banding and verification in
   * DuckDB. Same plan shape and scale properties as `near_dup_pairs`.
   */
  def cjkNearDup(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val base = t(dir, "documents").select(col("doc_id"), cjkPage.as("page"))
    val recrawls = base.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("page"), lit(" 的数据质量很重要")).as("page"))
    Dedup.nearDuplicatePairs(base.unionByName(recrawls), "doc_id", "page",
      threshold = 0.8, scriptAware = true)
  }

  val cjkNearDupSql: String = {
    val mhs = (0 until 12).map(j => s"${sqlMinhash(j)} AS mh$j").mkString(", ")
    val bands = (0 until 4)
      .map(b => s"md5(mh${3 * b} || '|' || mh${3 * b + 1} || '|' || mh${3 * b + 2}) AS band$b").mkString(", ")
    val unpivot = (0 until 4)
      .map(b => s"SELECT doc_id, $b AS band, band$b AS bh FROM banded").mkString(" UNION ALL ")
    s"""WITH pages0 AS (SELECT doc_id, $sqlCjkPage AS page FROM documents),
       pages AS (SELECT doc_id, page FROM pages0
                 UNION ALL
                 SELECT doc_id + 1000000, page || ' 的数据质量很重要'
                 FROM pages0 WHERE doc_id % 13 = 0),
       tok AS (SELECT doc_id, $sqlScriptToks AS toks FROM pages),
       docs AS (SELECT doc_id, $SqlShingles AS sh FROM tok),
       sig AS (SELECT doc_id, $mhs FROM docs),
       banded AS (SELECT doc_id, $bands FROM sig),
       buckets AS ($unpivot),
       capped AS (SELECT doc_id, band, bh FROM buckets
                  QUALIFY count(*) OVER (PARTITION BY band, bh) <= 1000),
       cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM capped a JOIN capped b ON a.band = b.band AND a.bh = b.bh
                WHERE a.doc_id < b.doc_id)
       SELECT id_a, id_b, jaccard FROM (
         SELECT id_a, id_b,
                round(cast(len(list_filter(a.sh, x -> list_contains(b.sh, x))) as double)
                      / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1), 4) AS jaccard
         FROM cand JOIN docs a ON cand.id_a = a.doc_id JOIN docs b ON cand.id_b = b.doc_id)
       WHERE jaccard >= 0.8"""
  }

  /**
   * `token_budget_cut`: [[TextAnalysis.selectTokenBudget]] — keep the
   * highest-scored documents whose cumulative token count fits a fixed
   * budget (the greedy fixed-compute selection every training run ends
   * with). Score = `n_chars`, tokens = whitespace count, budget 20k.
   * Oracle is ONE SQL cumulative sum over the same total order; the Spark
   * side must reproduce it exactly from its range-partitioned offset
   * arithmetic — the hash match IS the proof the distributed cut equals
   * the single-window definition.
   */
  def tokenBudgetCut(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents").select(col("doc_id"),
      col("n_chars").cast("long").as("score"),
      TextAnalysis.whitespaceTokenCount(col("text")).cast("long").as("n_tok"))
    TextAnalysis.selectTokenBudget(docs, "score", "n_tok", "doc_id", budgetTokens = 20000L)
      .select(col("doc_id"), col("score"), col("n_tok"), col("cum_tokens"))
  }

  val tokenBudgetCutSql: String =
    raw"""SELECT doc_id, score, n_tok, cum_tokens FROM (
         SELECT doc_id, score, n_tok,
                cast(sum(n_tok) OVER (ORDER BY score DESC, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS cum_tokens
         FROM (SELECT doc_id, cast(n_chars as bigint) AS score,
                      cast(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) as bigint) AS n_tok
               FROM documents))
       WHERE cum_tokens <= 20000"""

  /**
   * `token_budget_per_group`: [[TextAnalysis.selectTokenBudgetPerGroup]] —
   * the per-language budget cut behind real mixing decisions. en/de/zh get
   * budgets below their full token mass (every listed group's cut is
   * exercised); es/fr are absent from the map and must vanish entirely.
   * Oracle: one per-group SQL cumulative sum + a CASE budget lookup —
   * the hash match proves the distributed per-group cut equals the
   * single-window-per-group definition.
   */
  def tokenBudgetPerGroup(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents").select(col("doc_id"), col("lang"),
      col("n_chars").cast("long").as("score"),
      TextAnalysis.whitespaceTokenCount(col("text")).cast("long").as("n_tok"))
    TextAnalysis.selectTokenBudgetPerGroup(docs, "lang", "score", "n_tok", "doc_id",
      budgets = Map("en" -> 6000L, "de" -> 2000L, "zh" -> 2000L))
      .select(col("doc_id"), col("lang"), col("score"), col("n_tok"), col("cum_tokens"))
  }

  val tokenBudgetPerGroupSql: String =
    raw"""SELECT doc_id, lang, score, n_tok, cum_tokens FROM (
         SELECT doc_id, lang, score, n_tok,
                cast(sum(n_tok) OVER (PARTITION BY lang ORDER BY score DESC, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS cum_tokens
         FROM (SELECT doc_id, lang, cast(n_chars as bigint) AS score,
                      cast(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) as bigint) AS n_tok
               FROM documents))
       WHERE cum_tokens <= CASE lang WHEN 'en' THEN 6000
                                     WHEN 'de' THEN 2000
                                     WHEN 'zh' THEN 2000 END"""

  /**
   * `training_shuffle`: [[TextAnalysis.deterministicShuffle]] — the exact
   * global md5-keyed pseudo-random permutation a training export shuffles
   * by, computed WITHOUT a corpus-on-one-reducer window (range partition +
   * offset arithmetic, like `token_budget_cut`). The oracle is the plain
   * `row_number() OVER (ORDER BY md5(...))` definition — the hash match
   * proves the distributed ranks equal it position for position.
   */
  def trainingShuffle(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    TextAnalysis.deterministicShuffle(
      t(dir, "documents").select(col("doc_id"), col("lang")), "doc_id", salt = "r12")
  }

  val trainingShuffleSql: String =
    """SELECT doc_id, lang,
       cast(row_number() OVER (ORDER BY md5('shuffle:r12:' || doc_id), doc_id) as bigint) AS shuffle_rank
       FROM documents"""

  /**
   * `url_filter`: [[Web.urlQualityFlags]] — the C4/RefinedWeb-style
   * pre-fetch URL heuristics over six deterministic URL shapes, one per
   * gate: a clean page, an asset extension, an over-deep path, a
   * parameter explosion, a blocked word, an over-long URL. Oracle mirrors
   * every flag expression in DuckDB.
   */
  def urlFilter(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val id = col("doc_id").cast("string")
    val deep = (1 to 11).map(i => s"s$i").mkString("/", "/", "/")
    val manyParams = (1 to 10).map(i => s"p$i=$i").mkString("?", "&", "")
    val url = when(col("doc_id") % 6 === 0,
      concat(lit("https://"), col("source"), lit(".com/articles/"), id))
      .when(col("doc_id") % 6 === 1,
        concat(lit("https://"), col("source"), lit(".com/images/photo"), id, lit(".JPG")))
      .when(col("doc_id") % 6 === 2,
        concat(lit("https://"), col("source"), lit(s".com$deep"), id))
      .when(col("doc_id") % 6 === 3,
        concat(lit("https://"), col("source"), lit(s".com/p$manyParams")))
      .when(col("doc_id") % 6 === 4,
        concat(lit("https://"), col("source"), lit(".com/casino/bonus"), id))
      .otherwise(concat(lit("https://"), col("source"), lit(".com/search?q="),
        lit("x" * 600)))
    val flags = Web.urlQualityFlags(col("url")).map { case (n, c) => c.as(n) }
    t(dir, "documents").select(col("doc_id"), url.as("url"))
      .select(col("doc_id") +: col("url") +: flags: _*)
  }

  val urlFilterSql: String = {
    val deep = (1 to 11).map(i => s"s$i").mkString("/", "/", "/")
    val manyParams = (1 to 10).map(i => s"p$i=$i").mkString("?", "&", "")
    val longQ = "x" * 600
    val exts = Web.NonPageExtensions.map(e => s"'$e'").mkString(", ")
    val words = Seq("casino", "porn", "viagra", "xxx")
      .map(w => s"contains(lower(url), '$w')").mkString(" OR ")
    s"""WITH urls AS (
         SELECT doc_id,
           CASE doc_id % 6
             WHEN 0 THEN 'https://' || source || '.com/articles/' || doc_id
             WHEN 1 THEN 'https://' || source || '.com/images/photo' || doc_id || '.JPG'
             WHEN 2 THEN 'https://' || source || '.com$deep' || doc_id
             WHEN 3 THEN 'https://' || source || '.com/p$manyParams'
             WHEN 4 THEN 'https://' || source || '.com/casino/bonus' || doc_id
             ELSE 'https://' || source || '.com/search?q=$longQ' END AS url
         FROM documents),
       parsed AS (
         SELECT doc_id, url,
           regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
           regexp_extract(url, '\\?([^#]*)', 1) AS q
         FROM urls),
       feat AS (
         SELECT doc_id, url,
           lower(regexp_extract(path0, '\\.([A-Za-z0-9]{1,5})${"$"}', 1)) AS ext,
           regexp_replace(path0, '^/|/${"$"}', '', 'g') AS trimmed,
           q
         FROM parsed),
       flags AS (
         SELECT doc_id, url,
           CASE WHEN ext = '' OR ext NOT IN ($exts) THEN 1 ELSE 0 END AS ok_extension,
           CASE WHEN (CASE WHEN trimmed = '' THEN 0
                 ELSE length(trimmed) - length(replace(trimmed, '/', '')) + 1 END) <= 10
             THEN 1 ELSE 0 END AS ok_depth,
           CASE WHEN length(url) <= 512 THEN 1 ELSE 0 END AS ok_length,
           CASE WHEN (CASE WHEN q = '' THEN 0
                 ELSE length(q) - length(replace(q, '&', '')) + 1 END) <= 8
             THEN 1 ELSE 0 END AS ok_params,
           CASE WHEN $words THEN 0 ELSE 1 END AS ok_words
         FROM feat)
       SELECT doc_id, url,
              cast(ok_extension as bigint) AS ok_extension,
              cast(ok_depth as bigint) AS ok_depth,
              cast(ok_length as bigint) AS ok_length,
              cast(ok_params as bigint) AS ok_params,
              cast(ok_words as bigint) AS ok_words,
              cast(ok_extension * ok_depth * ok_length * ok_params * ok_words as bigint) AS passes
       FROM flags"""
  }

  /**
   * Contamination check: documents sharing word 3-grams with a probe set
   * (here: the texts of three fixed documents, playing the benchmark role).
   */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents")
    val probes = docs.filter(col("doc_id").isin(7L, 77L, 177L)).select(col("text"))
    TextAnalysis.contamination(docs, probes, n = 3)
  }

  val contaminationSql: String = {
    val grams = (toks: String) =>
      s"list_transform(range(1, greatest(len($toks) - 2, 1) + 1), i -> array_to_string($toks[i:i+2], ' '))"
    s"""WITH probe_grams AS (
         SELECT DISTINCT unnest(${grams("toks")}) AS gram
         FROM (SELECT $Toks AS toks FROM documents WHERE doc_id IN (7, 77, 177))),
       doc_grams AS (
         SELECT doc_id, unnest(list_distinct(${grams("toks")})) AS gram
         FROM (SELECT doc_id, $Toks AS toks FROM documents))
       SELECT doc_id, count(*) AS n_contaminated_grams
       FROM doc_grams JOIN probe_grams USING (gram)
       GROUP BY doc_id"""
  }

  /** Corpus-level top-50 bigrams by frequency. */
  def topNgrams(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.topNgrams(t(dir, "documents")(spark), "text", n = 2, k = 50)

  val topNgramsSql: String =
    s"""SELECT ngram, n FROM (
       SELECT ngram, count(*) AS n,
              row_number() OVER (ORDER BY count(*) DESC, ngram) AS rk
       FROM (SELECT unnest(list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                    i -> array_to_string(toks[i:i+1], ' '))) AS ngram
             FROM (SELECT $Toks AS toks FROM documents))
       GROUP BY ngram) WHERE rk <= 50"""

  /** Whitespace + BPE-ish token counts. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "documents").select(col("doc_id"),
      TextAnalysis.whitespaceTokenCount(col("text")).cast("long").as("ws_tokens"),
      TextAnalysis.bpeTokenCount(col("text")).cast("long").as("bpe_tokens"))
  }

  val tokenCountsSql: String =
    raw"""SELECT doc_id,
       cast(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) as bigint) AS ws_tokens,
       cast(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')) as bigint) AS bpe_tokens
       FROM documents"""

  /**
   * Interval overlap join: 14-day activity windows of one customer slice
   * against another's, via [[Joins.intervalOverlapJoin]] (bucket explode +
   * equi-join, each pair emitted in its first common bucket — never a
   * nested loop). Oracle is the plain inequality join.
   */
  def overlapJoinPairs(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    def days(c: Column) = datediff(c.cast("date"), lit("1970-01-01").cast("date")).cast("long")
    val o = t(dir, "orders")
    val a = o.filter(col("o_custkey") <= 2)
      .select(col("o_orderkey").as("key_a"), days(col("o_orderdate")).as("lo_a"),
        (days(col("o_orderdate")) + 14).as("hi_a"))
    val b = o.filter(col("o_custkey").between(3, 6))
      .select(col("o_orderkey").as("key_b"), days(col("o_orderdate")).as("lo_b"),
        (days(col("o_orderdate")) + 14).as("hi_b"))
    Joins.intervalOverlapJoin(a, b, "lo_a", "hi_a", "lo_b", "hi_b", bucketWidth = 14)
      .select(col("key_a"), col("key_b"))
  }

  val overlapJoinPairsSql: String =
    s"""WITH a AS (
         SELECT o_orderkey AS key_a,
                datediff('day', DATE '1970-01-01', cast(o_orderdate as date)) AS lo
         FROM orders WHERE o_custkey <= 2),
       b AS (
         SELECT o_orderkey AS key_b,
                datediff('day', DATE '1970-01-01', cast(o_orderdate as date)) AS lo2
         FROM orders WHERE o_custkey BETWEEN 3 AND 6)
       SELECT key_a, key_b FROM a, b WHERE lo < lo2 + 14 AND lo2 < lo + 14"""

  /**
   * Conversion funnel view -> click -> purchase over the first two event
   * days (the full month is degenerate — every user eventually completes;
   * the cutoff makes per-user truncated histories differ, so the
   * strictly-after chaining is actually exercised).
   */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    ops.Funnels.funnelCounts(
      events(dir).filter(col("ts") < lit("2024-01-03").cast("timestamp")),
      "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
  }

  val funnelStepsSql: String =
    s"""WITH e AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-03'),
       t1 AS (
         SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
       t2 AS (
         SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN t1 ON e.user_id = t1.user_id
         WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1),
       t3 AS (
         SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN t2 ON e.user_id = t2.user_id
         WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1)
       SELECT steps_reached, count(*) AS n_users FROM (
         SELECT t1.user_id,
                1 + CASE WHEN t2.user_id IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN t3.user_id IS NULL THEN 0 ELSE 1 END AS steps_reached
         FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
                 LEFT JOIN t3 ON t1.user_id = t3.user_id)
       GROUP BY steps_reached"""

  /**
   * `funnel_window`: the same view -> click -> purchase funnel TIME-BOUNDED
   * ([[ops.Funnels.funnel]] with `maxGap`): each step counts only within 12
   * hours of the first qualifying occurrence of the previous step. At this
   * bound the histogram genuinely differs from `funnel_steps` (70/18/4 vs
   * 51/20/21 users at sf0.01) — slow converters demote, so the window
   * predicate is actually exercised, not decorative.
   */
  def funnelWindow(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    ops.Funnels.funnelCounts(
      events(dir).filter(col("ts") < lit("2024-01-03").cast("timestamp")),
      "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
      maxGap = Some(expr("INTERVAL 12 HOURS")))
  }

  val funnelWindowSql: String =
    s"""WITH e AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-03'),
       t1 AS (
         SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
       t2 AS (
         SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN t1 ON e.user_id = t1.user_id
         WHERE e.event_type = 'click' AND e.ts > t1.t1
           AND e.ts <= t1.t1 + INTERVAL '12' HOUR GROUP BY 1),
       t3 AS (
         SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN t2 ON e.user_id = t2.user_id
         WHERE e.event_type = 'purchase' AND e.ts > t2.t2
           AND e.ts <= t2.t2 + INTERVAL '12' HOUR GROUP BY 1)
       SELECT steps_reached, count(*) AS n_users FROM (
         SELECT t1.user_id,
                1 + CASE WHEN t2.user_id IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN t3.user_id IS NULL THEN 0 ELSE 1 END AS steps_reached
         FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
                 LEFT JOIN t3 ON t1.user_id = t3.user_id)
       GROUP BY steps_reached"""

  /** Corpus vocabulary statistics (hapax share as exact integer ppm). */
  def vocabStats(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    TextAnalysis.vocabStats(t(dir, "documents"), "text")
  }

  val vocabStatsSql: String =
    s"""SELECT cast(sum(n) as bigint) AS n_tokens,
              count(*) AS n_terms,
              cast(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) as bigint) AS hapax_terms,
              cast((sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000) // count(*) as bigint) AS hapax_ppm
       FROM (SELECT t, count(*) AS n
             FROM (SELECT unnest(toks) AS t FROM (SELECT $Toks AS toks FROM documents))
             GROUP BY t)"""

  /** Gopher n-gram repetition signals (top/dup 2-gram token fractions). */
  def ngramRepetition(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    TextAnalysis.ngramRepetition(t(dir, "documents"), "doc_id", "text", n = 2)
  }

  val ngramRepetitionSql: String =
    s"""WITH toks AS (SELECT doc_id, $Toks AS toks FROM documents),
       grams AS (
         SELECT doc_id,
                unnest(CASE WHEN len(toks) >= 2
                       THEN list_transform(range(1, len(toks)), i -> array_to_string(toks[i:i+1], ' '))
                       ELSE []::VARCHAR[] END) AS gram
         FROM toks),
       per AS (SELECT doc_id, gram, count(*) AS cnt
               FROM grams GROUP BY doc_id, gram),
       stats AS (SELECT doc_id,
              round(max(cnt) * 2 / cast(sum(cnt) + 1 as double), 4) AS top_ngram_frac,
              round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) * 2 / cast(sum(cnt) + 1 as double), 4) AS dup_ngram_frac
              FROM per GROUP BY doc_id)
       SELECT d.doc_id, coalesce(top_ngram_frac, 0.0) AS top_ngram_frac,
              coalesce(dup_ngram_frac, 0.0) AS dup_ngram_frac
       FROM documents d LEFT JOIN stats USING (doc_id)"""

  /** Training-mix report per (source, lang): counts + exact ppm token share. */
  def corpusMix(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents").select(col("source"), col("lang"),
      TextAnalysis.whitespaceTokenCount(col("text")).cast("long").as("n_tok"))
    TextAnalysis.mixReport(docs, Seq("source", "lang"), "n_tok")
  }

  val corpusMixSql: String =
    raw"""WITH d AS (
         SELECT source, lang,
                cast(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) as bigint) AS n_tok
         FROM documents)
       SELECT source, lang, count(*) AS n_docs, cast(sum(n_tok) as bigint) AS n_tokens,
              cast((sum(n_tok) * 1000000) // (SELECT sum(n_tok) FROM d) as bigint) AS share_ppm
       FROM d GROUP BY source, lang"""

  /** Full + rolling-window document fingerprints. */
  def docFingerprints(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "documents").select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.rollingFingerprint(col("text")).as("rolling_fp"))
  }

  val docFingerprintsSql: String =
    s"""SELECT doc_id, md5($Norm) AS fp,
       list_min(list_transform(range(1, greatest(len(toks) - 4, 1) + 1),
                i -> md5(array_to_string(toks[i:i+4], ' ')))) AS rolling_fp
       FROM (SELECT doc_id, text, $Toks AS toks FROM documents)"""

  /** Exact cosine top-k: broadcast query set, no corpus shuffle. */
  def annBruteforceTopK(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val emb = t(dir, "embeddings")
    Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", k = 5)
  }

  val annBruteforceTopKSql: String =
    s"""SELECT query_id, neighbor_id, cosine, rank FROM (
       SELECT query_id, neighbor_id, cosine,
              row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    $SqlCos AS cosine
             FROM (SELECT vec_id, embedding AS qv FROM embeddings WHERE vec_id < 5) q,
                  (SELECT vec_id, embedding AS nv FROM embeddings) c
             WHERE q.vec_id <> c.vec_id))
       WHERE rank <= 5"""

  /**
   * `hashed_tf_topk`: the no-embedding-model similarity path — hashing-
   * trick TF vectors ([[TextAnalysis.hashedTfVector]], 64 dims) straight
   * off document text, then the same bounded-partial brute-force cosine
   * top-k as `ann_bruteforce_topk`. Oracle rebuilds the md5-dimension
   * vectors with hex-digit arithmetic and replays the identical cosine
   * and rank in DuckDB.
   */
  def hashedTfTopK(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    // the library operator owns the featurize-once barrier (local here; a
    // real cluster passes checkpointDir) and the token-free-doc filter
    Similarity.hashedTfTopK(t(dir, "documents"), "doc_id", "text",
      isQuery = col("doc_id") % 97 === 0, dims = 64, k = 5)
  }

  val hashedTfTopKSql: String = {
    def digit(i: Int) = s"(strpos('0123456789abcdef', substring(md5(t), $i, 1)) - 1)"
    val dim = s"((((${digit(1)} * 16 + ${digit(2)}) * 16 + ${digit(3)}) * 16 + ${digit(4)}) % 64)"
    s"""WITH dimtoks AS (
         SELECT doc_id, list_transform($Toks, t -> $dim) AS ds FROM documents
         WHERE len($Toks) > 0),
       vecs AS (
         SELECT doc_id,
           list_transform(range(0, 64), d ->
             cast(coalesce(list_sum(list_transform(ds, x -> CASE WHEN x = d THEN 1 ELSE 0 END)), 0) as double)) AS v
         FROM dimtoks)
       SELECT query_id, neighbor_id, cosine, rank FROM (
         SELECT query_id, neighbor_id, cosine,
                row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
         FROM (SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
                      $SqlCos AS cosine
               FROM (SELECT doc_id, v AS qv FROM vecs WHERE doc_id % 97 = 0) q,
                    (SELECT doc_id, v AS nv FROM vecs) c
               WHERE q.doc_id <> c.doc_id))
       WHERE rank <= 5"""
  }

  /**
   * `ann_quantized_topk`: brute-force cosine top-k over INT8-quantized
   * embeddings ([[Similarity.quantizeInt8]] → dequantize → the same
   * bounded-partial top-k) — the 4x-smaller-memory ANN tier. Quantization
   * uses half-up `floor(x + 0.5)` codes and a shared double scale, so the
   * oracle replays every code and every dequantized product bit-for-bit;
   * the hash match proves the whole quantize→dequantize→rank path is
   * engine-exact, not just approximately close.
   */
  def annQuantizedTopK(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val emb = t(dir, "embeddings").select(col("vec_id"),
      Similarity.dequantizeInt8(Similarity.quantizeInt8(col("embedding"))).as("qvec"))
    Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "qvec", k = 5)
  }

  val annQuantizedTopKSql: String = {
    val scale = "(list_max(list_transform(embedding, v -> abs(cast(v as double)))) / 127.0)"
    val qvec = s"""CASE WHEN $scale = 0
         THEN list_transform(embedding, v -> cast(0 as double))
         ELSE list_transform(embedding, v -> cast(floor(cast(v as double) / $scale + 0.5) as int) * $scale) END"""
    s"""WITH vecs AS (SELECT vec_id, $qvec AS v FROM embeddings)
       SELECT query_id, neighbor_id, cosine, rank FROM (
         SELECT query_id, neighbor_id, cosine,
                row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
         FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                      $SqlCos AS cosine
               FROM (SELECT vec_id, v AS qv FROM vecs WHERE vec_id < 5) q,
                    (SELECT vec_id, v AS nv FROM vecs) c
               WHERE q.vec_id <> c.vec_id))
       WHERE rank <= 5"""
  }

  /** Random-hyperplane LSH bucket histogram (the ANN scale path). */
  def annLshBuckets(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    Similarity.withLshBucket(t(dir, "embeddings"), "embedding", nbits = 8)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
  }

  private def sqlLshBucket(vec: String, nbits: Int = 8): String =
    (0 until nbits).map { i =>
      s"(CASE WHEN list_sum(list_transform(range(0, len($vec)), d -> cast($vec[d + 1] as double) * cast((($i * 31 + d * 17) % 7) - 3 as double))) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")

  val annLshBucketsSql: String =
    s"""SELECT bucket, count(*) AS n FROM (
       SELECT cast(${sqlLshBucket("embedding")} as bigint) AS bucket FROM embeddings)
       GROUP BY bucket"""

  /** Twin of [[Similarity.signSketchComposed]]: double-modulus hyperplane family. */
  private def sqlSignSketch(vec: String, nbits: Int = 48): String =
    (0 until nbits).map { i =>
      s"(CASE WHEN list_sum(list_transform(range(0, len($vec)), d -> cast($vec[d + 1] as double) * cast((($i * 37 + d * 11) % 101) % 7 - 3 as double))) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")

  /**
   * Quantized ANN: 48-bit sign-sketch Hamming scan (8 bytes per corpus row)
   * picks 20 candidates per query, exact cosine reranks. The memory-bound
   * scale path between brute force and LSH bucketing.
   */
  def annHammingTopK(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val emb = t(dir, "embeddings")
    Similarity.hammingTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
      k = 5, nbits = 48, candidates = 20)
  }

  val annHammingTopKSql: String =
    s"""WITH sk AS (
         SELECT vec_id, embedding, cast(${sqlSignSketch("embedding")} as bigint) AS s
         FROM embeddings),
       cand AS (
         SELECT query_id, qv, neighbor_id, hamming,
                row_number() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS hr
         FROM (SELECT q.vec_id AS query_id, q.embedding AS qv, c.vec_id AS neighbor_id,
                      cast(bit_count(xor(q.s, c.s)) as bigint) AS hamming
               FROM (SELECT * FROM sk WHERE vec_id < 5) q, sk c
               WHERE q.vec_id <> c.vec_id)),
       res AS (
         SELECT query_id, neighbor_id, hamming, cosine,
                row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
         FROM (SELECT query_id, neighbor_id, hamming, $SqlCos AS cosine
               FROM (SELECT query_id, qv, neighbor_id, hamming FROM cand WHERE hr <= 20) x
               JOIN (SELECT vec_id AS neighbor_id, embedding AS nv FROM embeddings) e
               USING (neighbor_id)))
       SELECT query_id, neighbor_id, hamming, cosine, rank FROM res WHERE rank <= 5"""

  /** Component `i` of the deterministic 8-dim random projection (twin of
    * [[Similarity.randomProject]] — signSketch weight family, value kept). */
  private def sqlRandomProjComp(vec: String, i: Int): String =
    s"coalesce(list_sum(list_transform(range(0, len($vec)), d -> cast($vec[d + 1] as double) * cast((($i * 37 + d * 11) % 101) % 7 - 3 as double))), 0.0)"

  /**
   * Projection-space ANN ([[Similarity.projectedTopK]]): candidates rank by
   * cosine in the 8-dim deterministic random projection (scan cost an order
   * of magnitude under the full vector at production dims), top 20 rerank
   * by exact full-vector cosine. Every stage is deterministic double math
   * in a fixed fold order, so the whole pass replays in DuckDB.
   */
  def annProjectedTopK(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val emb = t(dir, "embeddings")
    Similarity.projectedTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
      k = 5, projDims = 8, candidates = 20)
  }

  val annProjectedTopKSql: String = {
    val p = "[" + (0 until 8).map(i => sqlRandomProjComp("embedding", i)).mkString(", ") + "]"
    s"""WITH pr AS (
         SELECT vec_id, embedding, $p AS p FROM embeddings),
       cand AS (
         SELECT query_id, fullq, neighbor_id,
                row_number() OVER (PARTITION BY query_id ORDER BY pcos DESC, neighbor_id) AS prank
         FROM (SELECT q.vec_id AS query_id, q.embedding AS fullq, c.vec_id AS neighbor_id,
                      $SqlCos AS pcos
               FROM (SELECT vec_id, embedding, p AS qv FROM pr WHERE vec_id < 5) q,
                    (SELECT vec_id, p AS nv FROM pr) c
               WHERE q.vec_id <> c.vec_id)),
       res AS (
         SELECT query_id, neighbor_id, cosine,
                row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
         FROM (SELECT query_id, neighbor_id, $SqlCos AS cosine
               FROM (SELECT query_id, fullq AS qv, neighbor_id FROM cand WHERE prank <= 20) x
               JOIN (SELECT vec_id AS neighbor_id, embedding AS nv FROM embeddings) e
               USING (neighbor_id)))
       SELECT query_id, neighbor_id, cosine, rank FROM res WHERE rank <= 5"""
  }

  /**
   * Embedding-cosine near-duplicates within LSH buckets. The testdata
   * embeddings are near-orthogonal random vectors (max pairwise cosine
   * ~0.51), so the "duplicate" bar here is 0.3 with coarse 4-bit buckets —
   * production corpora would use ~0.95 and more bits.
   */
  def embeddingNeardup(spark: SparkSession, dir: String): DataFrame =
    Similarity.embeddingNearDupPairs(t(dir, "embeddings")(spark), "vec_id", "embedding",
      threshold = 0.3, nbits = 4)

  val embeddingNeardupSql: String =
    s"""WITH bucketed AS (
         SELECT vec_id, embedding, cast(${sqlLshBucket("embedding", 4)} as bigint) AS bucket
         FROM embeddings)
       SELECT DISTINCT id_a, id_b, cosine FROM (
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                $SqlCos AS cosine
         FROM (SELECT vec_id, embedding AS qv, bucket FROM bucketed) a
         JOIN (SELECT vec_id, embedding AS nv, bucket FROM bucketed) b USING (bucket)
         WHERE a.vec_id < b.vec_id)
       WHERE cosine >= 0.3"""

  /**
   * IVF ANN: cells + probe-and-rerank. The verified path uses
   * [[Similarity.ivfAssignSeeded]] (deterministic pinned-sample centroids) so
   * the whole index — assignment, probe selection, rerank — replays
   * bit-for-bit in DuckDB; the MLlib k-means training path ([[Similarity.ivfAssign]])
   * is covered by SimilaritySpec's recall>=0.9 check instead (k-means has no
   * SQL twin).
   */
  def annIvfTopK(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val emb = t(dir, "embeddings")
    val (assigned, centroids) = Similarity.ivfAssignSeeded(emb, "vec_id", "embedding", k = 8)
    Similarity.ivfTopK(emb.filter(col("vec_id") < 5), assigned, centroids,
      "vec_id", "embedding", k = 5, nprobe = 2)
  }

  val annIvfTopKSql: String =
    s"""WITH cent AS (
         SELECT rk - 1 AS centroid_id, embedding AS cv FROM (
           SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) AS rk FROM embeddings)
         WHERE rk <= 8),
       assigned AS (
         SELECT vec_id, embedding, centroid_id FROM (
           SELECT vec_id, embedding, centroid_id,
                  row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) AS rn
           FROM (SELECT e.vec_id, e.qv AS embedding, c.centroid_id, $SqlCos AS cos
                 FROM (SELECT vec_id, embedding AS qv FROM embeddings) e
                 CROSS JOIN (SELECT centroid_id, cv AS nv FROM cent) c))
         WHERE rn = 1),
       probes AS (
         SELECT query_id, qv, centroid_id FROM (
           SELECT query_id, qv, centroid_id,
                  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, centroid_id) AS rn
           FROM (SELECT q.vec_id AS query_id, q.qv, c.centroid_id, $SqlCos AS cos
                 FROM (SELECT vec_id, embedding AS qv FROM embeddings WHERE vec_id < 5) q
                 CROSS JOIN (SELECT centroid_id, cv AS nv FROM cent) c))
         WHERE rn <= 2),
       cand AS (
         SELECT p.query_id, p.qv, a.vec_id AS neighbor_id, a.embedding AS nv
         FROM probes p JOIN assigned a USING (centroid_id)
         WHERE p.query_id <> a.vec_id)
       SELECT query_id, neighbor_id, cosine, rank FROM (
         SELECT query_id, neighbor_id, cosine,
                row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
         FROM (SELECT query_id, neighbor_id, $SqlCos AS cosine FROM cand))
       WHERE rank <= 5"""

  /** Multimodal: opaque binary payloads + SQL-side metadata. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val payload = encode(col("text"), "UTF-8")
    val meta = Multimodal.payloadMeta(payload).map { case (n, c) => c.as(n) }
    t(dir, "documents").select(col("doc_id") +: meta: _*)
  }

  val multimodalMetaSql: String =
    """SELECT doc_id, cast(octet_length(encode(text)) as bigint) AS byte_len, md5(text) AS checksum
       FROM documents"""

  /**
   * Deterministic frame-sampling offsets over binary payloads. The offsets
   * surface as a comma-joined string: the driver's pandas-side compare sorts
   * result columns, and raw array cells are unsortable there (round 2's only
   * broken check) — the list itself is still computed and verified.
   */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val off = Multimodal.sampleOffsets(encode(col("text"), "UTF-8"), 4)
    t(dir, "documents").select(col("doc_id"),
      array_join(transform(off, _.cast("string")), ",").as("offsets"))
  }

  val multimodalFramesSql: String =
    """SELECT doc_id,
       array_to_string(list_transform(range(0, 4),
         i -> cast(i * cast(octet_length(encode(text)) as bigint) // 4 as varchar)), ',') AS offsets
       FROM documents"""

  /**
   * Fixed-size overlapping document chunks (pre-embedding/training step);
   * chunk text surfaces as length + md5 so the compare stays narrow.
   */
  def chunkDocuments(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    TextAnalysis.chunkDocuments(t(dir, "documents"), "doc_id", "text",
      chunkChars = 200, overlap = 20)
      .select(col("doc_id"), col("chunk_id"),
        length(col("chunk_text")).cast("long").as("chunk_len"),
        md5(col("chunk_text")).as("chunk_fp"))
  }

  val chunkDocumentsSql: String =
    """SELECT doc_id, chunk_id,
       cast(length(substring(text, cast(chunk_id * 180 + 1 as int), 200)) as bigint) AS chunk_len,
       md5(substring(text, cast(chunk_id * 180 + 1 as int), 200)) AS chunk_fp
       FROM (SELECT doc_id, text,
               unnest(range(0, greatest((length(text) - 20 + 179) // 180, 1))) AS chunk_id
             FROM documents)"""

  /**
   * Gopher-style intra-document repetition stats (duplicate-line and
   * duplicate-character fractions) — exact rational math both sides.
   */
  def docRepetition(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    TextAnalysis.repetitionStats(t(dir, "documents"), "doc_id", "text")
  }

  val docRepetitionSql: String =
    raw"""WITH lines AS (
         SELECT doc_id, lower(trim(regexp_replace(line, '\s+', ' ', 'g'))) AS nl
         FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents)
         WHERE lower(trim(regexp_replace(line, '\s+', ' ', 'g'))) <> ''),
       per AS (
         SELECT doc_id, nl, count(*) AS n, length(nl) AS len
         FROM lines GROUP BY doc_id, nl)
       SELECT doc_id, cast(sum(n) as bigint) AS n_lines,
              round((sum(n) - count(*)) / cast(sum(n) as double), 4) AS dup_line_frac,
              round(sum(CASE WHEN n > 1 THEN n * len ELSE 0 END) / cast(sum(n * len) as double), 4) AS dup_char_frac
       FROM per GROUP BY doc_id"""

  /**
   * Per-document top-3 terms by the exact rational tf-idf weight
   * `tf * n_docs / df` (no `ln`: libm-dependent, not engine-portable;
   * identical top-k ranking within a document).
   */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    TextAnalysis.tfidfTopTerms(t(dir, "documents"), "doc_id", "text", k = 3)
  }

  val tfidfTopTermsSql: String =
    s"""WITH terms AS (
         SELECT doc_id, unnest($Toks) AS term FROM documents),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
       dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY term),
       nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
       SELECT doc_id, term, tf, df, score, rank FROM (
         SELECT doc_id, term, tf, df,
                round(tf * n_docs / cast(df as double), 6) AS score,
                row_number() OVER (PARTITION BY doc_id
                  ORDER BY round(tf * n_docs / cast(df as double), 6) DESC, term) AS rank
         FROM tf JOIN dfreq USING (term), nd)
       WHERE rank <= 3"""

  /**
   * SemDeDup-style semantic dedup over the deterministic IVF cells: keep the
   * smallest-id member of every within-cell duplicate set (cosine >= 0.3 —
   * the testdata vectors are near-orthogonal, production uses ~0.95).
   */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    Similarity.semanticDedup(t(dir, "embeddings"), "vec_id", "embedding", k = 8, threshold = 0.3)
      .select(col("vec_id"), col("label"))
  }

  val semanticDedupSql: String =
    s"""WITH cent AS (
         SELECT rk - 1 AS centroid_id, embedding AS cv FROM (
           SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) AS rk FROM embeddings)
         WHERE rk <= 8),
       assigned AS (
         SELECT vec_id, embedding, centroid_id FROM (
           SELECT vec_id, embedding, centroid_id,
                  row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) AS rn
           FROM (SELECT e.vec_id, e.qv AS embedding, c.centroid_id, $SqlCos AS cos
                 FROM (SELECT vec_id, embedding AS qv FROM embeddings) e
                 CROSS JOIN (SELECT centroid_id, cv AS nv FROM cent) c))
         WHERE rn = 1),
       dropped AS (
         SELECT DISTINCT b.vec_id
         FROM (SELECT centroid_id, vec_id, embedding AS nv FROM assigned) b
         JOIN (SELECT centroid_id, vec_id AS id_a, embedding AS qv FROM assigned) a
           USING (centroid_id)
         WHERE a.id_a < b.vec_id AND $SqlCos >= 0.3)
       SELECT vec_id, label FROM embeddings
       WHERE vec_id NOT IN (SELECT vec_id FROM dropped)"""

  /**
   * Context-window sequence packing: per-source running token totals assign
   * each document a chunk id under a 512-token budget. One window shuffle on
   * `source`; groups pack independently at any scale.
   */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents").select(col("doc_id"), col("source"),
      TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_tokens"))
    TextAnalysis.packSequences(docs, "source", "doc_id", "n_tokens", contextLen = 512)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("chunk_id"))
  }

  val packSequencesSql: String =
    raw"""SELECT doc_id, source, n_tokens,
       cast((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 512 as bigint) AS chunk_id
       FROM (SELECT doc_id, source,
               cast(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')) as bigint) AS n_tokens
             FROM documents)"""

  /**
   * Deterministic per-language stratified sampling (training-mix
   * re-weighting): hash-bucket keep decision, exact integer compare — same
   * rows survive on any engine, any partitioning.
   */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val rates = Map("en" -> 60, "de" -> 40, "fr" -> 40, "es" -> 20, "zh" -> 10)
    t(dir, "documents")
      .filter(TextAnalysis.stratifiedKeep(col("doc_id"), col("lang"), rates))
      .select(col("doc_id"), col("lang"))
  }

  val stratifiedSampleSql: String = {
    val bucket = sqlHashBucket("doc_id")
    s"""SELECT doc_id, lang FROM documents
       WHERE $bucket * 100 < (CASE lang WHEN 'en' THEN 60 WHEN 'de' THEN 40 WHEN 'fr' THEN 40
                                        WHEN 'es' THEN 20 WHEN 'zh' THEN 10 ELSE 0 END) * 65536"""
  }

  /**
   * Data-driven target-mix rebalancing ([[TextAnalysis.targetMixSample]]):
   * make the corpus 40% en / 20% de / 20% fr / 20% zh (es drops). Rates
   * derive from the actual group counts in exact integer math — the
   * binding group keeps every row; the rest downsample to match.
   */
  def targetMixQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    TextAnalysis.targetMixSample(
      t(dir, "documents").select(col("doc_id"), col("lang")),
      "lang", "doc_id",
      Map("en" -> 400000, "de" -> 200000, "fr" -> 200000, "zh" -> 200000))
      .select(col("doc_id"), col("lang"))
  }

  val targetMixSql: String = {
    val bucket = sqlHashBucket("doc_id")
    s"""WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
       tgt AS (SELECT lang, n,
                 CASE lang WHEN 'en' THEN 400000 WHEN 'de' THEN 200000
                           WHEN 'fr' THEN 200000 WHEN 'zh' THEN 200000 ELSE 0 END AS t
               FROM counts),
       feasible AS (SELECT min(cast(n AS hugeint) * 1000000 // t) AS m FROM tgt WHERE t > 0)
       SELECT doc_id, lang
       FROM documents d JOIN tgt USING (lang), feasible
       WHERE t > 0 AND cast($bucket AS hugeint) * n * 1000000 < cast(t AS hugeint) * m * 65536"""
  }

  // ---- round 5: curation planning + incremental corpus ops ------------

  /**
   * Per-source document cap (domain cap): keep at most 10 docs per source,
   * chosen by hashed-id order — an unbiased deterministic sample per domain.
   */
  def sourceCapQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    TextAnalysis.sourceCap(
      t(dir, "documents").select(col("doc_id"), col("source")),
      "source", "doc_id", maxDocs = 10)
  }

  val sourceCapSql: String =
    """SELECT doc_id, source, cap_rank FROM (
       SELECT doc_id, source,
              row_number() OVER (PARTITION BY source ORDER BY md5('graft:' || doc_id), doc_id) AS cap_rank
       FROM documents)
       WHERE cap_rank <= 10"""

  /**
   * Deterministic per-row weighted sampling: keep probability scales with a
   * per-row quality prior (here: doc length), exact integer hash threshold.
   */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "documents")
      .withColumn("rate_pct", least(lit(100L), expr("n_chars DIV 20")).cast("long"))
      .filter(TextAnalysis.weightedKeep(col("doc_id"), col("rate_pct")))
      .select(col("doc_id"), col("rate_pct"))
  }

  val weightedSampleSql: String = {
    val bucket = sqlHashBucket("doc_id")
    s"""SELECT doc_id, rate_pct FROM (
       SELECT doc_id, cast(least(100, n_chars // 20) as bigint) AS rate_pct FROM documents)
       WHERE $bucket * 100 < rate_pct * 65536"""
  }

  /** BPE merge-candidate counts: top adjacent char pairs weighted by word frequency. */
  def bpePairsQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    TextAnalysis.bpePairs(t(dir, "documents"), "text", k = 50)
  }

  val bpePairsSql: String =
    s"""WITH words AS (
         SELECT t AS w, count(*) AS wc
         FROM (SELECT unnest($Toks) AS t FROM documents) GROUP BY t),
       pairs AS (
         SELECT unnest(list_transform(range(1, len(w)), i -> substring(w, i, 2))) AS pair, wc
         FROM words WHERE len(w) >= 2)
       SELECT pair, cast(sum(wc) as bigint) AS cnt
       FROM pairs GROUP BY pair
       ORDER BY cnt DESC, pair LIMIT 50"""

  /**
   * Fixed BPE merge list for the `bpe_tokenize` battery query: the first 8
   * merges [[graft.ops.Bpe.learn]] learns on the sf0.001 documents corpus
   * (hardcoded so the query is a pure function of its input — the 8th merge
   * chains on the 7th, exercising rank ordering). The oracle twin applies
   * the same merges as a global-`replace` chain over space-terminated
   * symbol strings, which is exactly greedy left-to-right non-overlapping
   * pair merging.
   */
  private val BpeFixedMerges = Seq(
    "e" -> "r", "o" -> "r", "i" -> "n", "o" -> "w",
    "s" -> "t", "l" -> "u", "a" -> "r", "p" -> "ar")

  /** BPE tokenization with the fixed learned merges: top-50 vocabulary
    * tokens by frequency-weighted count. Corpus-sized work is ONE word
    * count; the merge folds run per DISTINCT word (vocab-sized). */
  def bpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(explode(Bpe.applyMergePairs(col("w"), BpeFixedMerges)).as("token"), col("wc"))
      .groupBy(col("token")).agg(sum(col("wc")).cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(50)
  }

  val bpeTokenizeSql: String = {
    val symbols = BpeFixedMerges.foldLeft(raw"regexp_replace(w, '(.)', '\1 ', 'g')") {
      case (s, (a, b)) => s"replace($s, '$a $b ', '$a$b ')"
    }
    s"""WITH words AS (
         SELECT t AS w, count(*) AS wc
         FROM (SELECT unnest($Toks) AS t FROM documents) GROUP BY t),
       toks AS (
         SELECT unnest(list_filter(string_split($symbols, ' '), x -> x <> '')) AS token, wc
         FROM words)
       SELECT token, cast(sum(wc) as bigint) AS cnt
       FROM toks GROUP BY token
       ORDER BY cnt DESC, token LIMIT 50"""
  }

  /** CCNet-style reference-LM quality filter (portable re-expression): the
    * 100 least-typical documents under the corpus's own capped unigram
    * model — the tail a perplexity filter would drop. */
  def typicalityScoreQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents")
    TextAnalysis.typicalityScores(docs, "doc_id", "text", docs, "text", vocabSize = 4096)
      .orderBy(col("typicality_ppm"), col("doc_id"))
      .limit(100)
  }

  val typicalityScoreSql: String =
    s"""WITH terms AS (
         SELECT t AS term, count(*) AS cnt
         FROM (SELECT unnest($Toks) AS t FROM documents) GROUP BY t),
       tot AS (SELECT sum(len($Toks)) AS tot FROM documents),
       model AS (
         SELECT term, cast(cast(cnt as hugeint) * 1000000 // tot as bigint) AS ppm
         FROM terms, tot ORDER BY cnt DESC, term LIMIT 4096),
       doc_terms AS (SELECT doc_id, unnest($Toks) AS term FROM documents),
       scored AS (
         SELECT doc_id, count(*) AS n_tok, sum(coalesce(ppm, 0)) AS sum_ppm
         FROM doc_terms LEFT JOIN model USING (term) GROUP BY doc_id)
       SELECT doc_id, cast(n_tok as bigint) AS n_tok,
              cast(sum_ppm // n_tok as bigint) AS typicality_ppm
       FROM scored
       ORDER BY typicality_ppm, doc_id LIMIT 100"""

  /**
   * `ccnet_buckets`: [[TextAnalysis.typicalityTerciles]] — the corpus
   * split into exact head/middle/tail typicality terciles (the CCNet
   * recipe's final step), aggregated per bucket with exact integer
   * min/max/mean ppm. The oracle reruns the whole model + scoring chain
   * and the plain one-window rank/tercile definition; the hash match
   * proves the distributed bucketing equals it.
   */
  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents")
    TextAnalysis.typicalityTerciles(docs, "doc_id", "text", docs, "text")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("typicality_ppm")).cast("long").as("min_ppm"),
        max(col("typicality_ppm")).cast("long").as("max_ppm"),
        expr("CAST(CAST(sum(typicality_ppm) AS DECIMAL(38,0)) DIV count(1) AS BIGINT)")
          .as("mean_ppm"))
  }

  val ccnetBucketsSql: String =
    s"""WITH terms AS (
         SELECT t AS term, count(*) AS cnt
         FROM (SELECT unnest($Toks) AS t FROM documents) GROUP BY t),
       tot AS (SELECT sum(len($Toks)) AS tot FROM documents),
       model AS (
         SELECT term, cast(cast(cnt as hugeint) * 1000000 // tot as bigint) AS ppm
         FROM terms, tot ORDER BY cnt DESC, term LIMIT 4096),
       doc_terms AS (SELECT doc_id, unnest($Toks) AS term FROM documents),
       scored AS (
         SELECT doc_id, count(*) AS n_tok, sum(coalesce(ppm, 0)) AS sum_ppm
         FROM doc_terms LEFT JOIN model USING (term) GROUP BY doc_id),
       ranked AS (
         SELECT doc_id, cast(sum_ppm // n_tok as bigint) AS typicality_ppm,
                row_number() OVER (ORDER BY cast(sum_ppm // n_tok as bigint) DESC, doc_id) AS r,
                count(*) OVER () AS total
         FROM scored)
       SELECT CASE ((r - 1) * 3) // total WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
                ELSE 'tail' END AS bucket,
              count(*) AS n_docs,
              cast(min(typicality_ppm) as bigint) AS min_ppm,
              cast(max(typicality_ppm) as bigint) AS max_ppm,
              cast(sum(typicality_ppm) // count(*) as bigint) AS mean_ppm
       FROM ranked GROUP BY 1"""

  /**
   * `sentence_stats`: [[TextAnalysis.sentences]] over synthetic punctuated
   * pages (the word-soup corpus has no terminators) — segment count and
   * exact integer mean segment length; multi-terminator runs (`?!`) and a
   * trailing unterminated fragment are exercised.
   */
  def sentenceStats(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val page = concat(col("text"), lit(". Was that expected?! Probably. "),
      col("source"), lit(" says: fine! trailing fragment"))
    t(dir, "documents").select(col("doc_id"), page.as("page"))
      .select(col("doc_id"),
        size(TextAnalysis.sentences(col("page"))).cast("long").as("n_sentences"),
        expr("CAST(aggregate(regexp_extract_all(page, '[^.!?]+[.!?]+|[^.!?]+$', 0), " +
          "0L, (a, x) -> a + length(x)) DIV " +
          "size(regexp_extract_all(page, '[^.!?]+[.!?]+|[^.!?]+$', 0)) AS BIGINT)")
          .as("mean_sentence_chars"))
  }

  val sentenceStatsSql: String =
    s"""SELECT doc_id,
       cast(len(sents) as bigint) AS n_sentences,
       cast(list_sum(list_transform(sents, x -> length(x))) // len(sents) as bigint) AS mean_sentence_chars
       FROM (SELECT doc_id,
               regexp_extract_all(text || '. Was that expected?! Probably. ' || source || ' says: fine! trailing fragment',
                 '[^.!?]+[.!?]+|[^.!?]+${"$"}') AS sents
             FROM documents)"""

  /**
   * `sentence_chunks`: [[TextAnalysis.chunkBySentences]] over synthetic
   * many-sentence pages (every word-soup token becomes a sentence via
   * `' ' -> '. '`) — maxChars=120 / overlap=30, so chunks pack several
   * sentences, break only at sentence boundaries, and boundary-straddling
   * sentences repeat in the next chunk. Oracle replays the same prefix-sum
   * offsets and offset-window membership in DuckDB.
   */
  def sentenceChunks(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val page = regexp_replace(col("text"), " ", ". ")
    val docs = t(dir, "documents").select(col("doc_id"), page.as("page"))
    TextAnalysis.chunkBySentences(docs, "doc_id", "page", maxChars = 120, overlap = 30)
      .select(col("doc_id"), col("chunk_id"),
        length(col("chunk_text")).cast("long").as("chunk_len"),
        md5(col("chunk_text")).as("chunk_fp"))
  }

  val sentenceChunksSql: String =
    s"""WITH segs AS (
         SELECT doc_id,
           regexp_extract_all(regexp_replace(text, ' ', '. ', 'g'),
             '[^.!?]+[.!?]+|[^.!?]+${"$"}') AS sents
         FROM documents),
       w AS (
         SELECT doc_id, sents,
           list_transform(range(1, len(sents) + 1),
             i -> cast(coalesce(list_sum(list_transform(sents[1:i-1], x -> length(x))), 0) as bigint)) AS starts
         FROM segs WHERE len(sents) > 0),
       c AS (SELECT doc_id, sents, starts,
               unnest(range(0, starts[-1] // 90 + 1)) AS chunk_id FROM w)
       SELECT doc_id, cast(chunk_id as bigint) AS chunk_id,
              cast(length(chunk_text) as bigint) AS chunk_len,
              md5(chunk_text) AS chunk_fp
       FROM (SELECT doc_id, chunk_id,
               array_to_string(list_transform(list_filter(range(1, len(sents) + 1),
                 i -> starts[i] // 90 = chunk_id
                   OR (starts[i] // 90 - 1 = chunk_id AND starts[i] % 90 < 30)),
                 i -> sents[i]), '') AS chunk_text
             FROM c)
       WHERE chunk_text <> ''"""

  /** The bigram upgrade of the CCNet-style filter: the 100 least-typical
    * documents under the corpus's own capped BIGRAM model — common word
    * ORDER now scores, not just common words. */
  def typicalityBigramQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents")
    TextAnalysis.typicalityScoresN(docs, "doc_id", "text", docs, "text", n = 2, vocabSize = 4096)
      .orderBy(col("typicality_ppm"), col("doc_id"))
      .limit(100)
  }

  val typicalityBigramSql: String =
    s"""WITH grams0 AS (
         SELECT doc_id,
           CASE WHEN len(toks) >= 2
             THEN list_transform(range(1, len(toks)), i -> array_to_string(toks[i:i+1], ' '))
             ELSE CAST([] AS VARCHAR[]) END AS grams
         FROM (SELECT doc_id, $Toks AS toks FROM documents)),
       terms AS (
         SELECT g AS gram, count(*) AS cnt
         FROM (SELECT unnest(grams) AS g FROM grams0) GROUP BY g),
       tot AS (SELECT sum(len(grams)) AS tot FROM grams0),
       model AS (
         SELECT gram, cast(cast(cnt as hugeint) * 1000000 // tot as bigint) AS ppm
         FROM terms, tot ORDER BY cnt DESC, gram LIMIT 4096),
       doc_grams AS (SELECT doc_id, unnest(grams) AS gram FROM grams0),
       scored AS (
         SELECT doc_id, count(*) AS n_grams, sum(coalesce(ppm, 0)) AS sum_ppm
         FROM doc_grams LEFT JOIN model USING (gram) GROUP BY doc_id)
       SELECT doc_id, cast(n_grams as bigint) AS n_grams,
              cast(sum_ppm // n_grams as bigint) AS typicality_ppm
       FROM scored
       ORDER BY typicality_ppm, doc_id LIMIT 100"""

  /**
   * `typicality_backoff`: stupid-backoff scoring — bigram model first,
   * `40% of unigram(second word)` when the pair is unseen — over the same
   * corpus-built capped models as `typicality_score`/`typicality_bigram`.
   * The 100 least-typical documents; oracle rebuilds both models and the
   * same integer backoff in DuckDB.
   */
  def typicalityBackoffQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents")
    TextAnalysis.typicalityScoresBackoff(docs, "doc_id", "text", docs, "text",
      vocabSize = 4096, alphaPct = 40)
      .orderBy(col("typicality_ppm"), col("doc_id"))
      .limit(100)
  }

  val typicalityBackoffSql: String =
    s"""WITH toks0 AS (SELECT doc_id, $Toks AS toks FROM documents),
       grams0 AS (
         SELECT doc_id,
           CASE WHEN len(toks) >= 2
             THEN list_transform(range(1, len(toks)), i -> array_to_string(toks[i:i+1], ' '))
             ELSE CAST([] AS VARCHAR[]) END AS grams,
           toks
         FROM toks0),
       uterms AS (
         SELECT t AS term, count(*) AS cnt
         FROM (SELECT unnest(toks) AS t FROM toks0) GROUP BY t),
       utot AS (SELECT sum(len(toks)) AS tot FROM toks0),
       uni AS (
         SELECT term, cast(cast(cnt as hugeint) * 1000000 // tot as bigint) AS uni_ppm
         FROM uterms, utot ORDER BY cnt DESC, term LIMIT 4096),
       bterms AS (
         SELECT g AS gram, count(*) AS cnt
         FROM (SELECT unnest(grams) AS g FROM grams0) GROUP BY g),
       btot AS (SELECT sum(len(grams)) AS tot FROM grams0),
       bi AS (
         SELECT gram, cast(cast(cnt as hugeint) * 1000000 // tot as bigint) AS bi_ppm
         FROM bterms, btot ORDER BY cnt DESC, gram LIMIT 4096),
       doc_grams AS (SELECT doc_id, unnest(grams) AS gram FROM grams0),
       scored AS (
         SELECT doc_id, count(*) AS n_grams,
                sum(coalesce(bi_ppm, 40 * coalesce(uni_ppm, 0) // 100)) AS sum_ppm
         FROM doc_grams
           LEFT JOIN bi USING (gram)
           LEFT JOIN uni ON split_part(gram, ' ', 2) = term
         GROUP BY doc_id)
       SELECT doc_id, cast(n_grams as bigint) AS n_grams,
              cast(sum_ppm // n_grams as bigint) AS typicality_ppm
       FROM scored
       ORDER BY typicality_ppm, doc_id LIMIT 100"""

  /**
   * Mixture plan: uniform target ppm share per observed source; per source
   * the available tokens, planned budget, sampling rate and epoch
   * multiplier — all exact integer math.
   */
  def mixPlanQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents").select(col("source"),
      TextAnalysis.whitespaceTokenCount(col("text")).cast("long").as("n_tok"))
    // derive the target list from the same per-source agg mixPlan builds
    // internally: every corpus-side exchange then has one canonical form,
    // which ReuseExchange executes once however many times it appears
    val srcs = docs.groupBy(col("source"))
      .agg(sum(col("n_tok")).cast("long").as("avail_tokens"))
      .select(col("source"))
    val nSrc = broadcast(srcs.agg(count(lit(1)).as("__n")))
    val targets = srcs.join(nSrc)
      .withColumn("target_ppm", expr("CAST(1000000 DIV __n AS BIGINT)"))
      .drop("__n")
    TextAnalysis.mixPlan(docs, "source", "n_tok", targets)
  }

  val mixPlanSql: String =
    raw"""WITH d AS (
         SELECT source,
                cast(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) as bigint) AS n_tok
         FROM documents),
       avail AS (SELECT source, cast(sum(n_tok) as bigint) AS avail_tokens FROM d GROUP BY source),
       tgt AS (SELECT source, cast(1000000 // (SELECT count(*) FROM avail) as bigint) AS target_ppm FROM avail),
       tot AS (SELECT cast(sum(avail_tokens) as bigint) AS total FROM avail)
       SELECT a.source, a.avail_tokens, t.target_ppm,
              cast(tot.total * t.target_ppm // 1000000 as bigint) AS planned_tokens,
              cast(least(1000000, (tot.total * t.target_ppm // 1000000) * 1000000 // a.avail_tokens) as bigint) AS rate_ppm,
              cast(((tot.total * t.target_ppm // 1000000) * 100 + a.avail_tokens - 1) // a.avail_tokens as bigint) AS epochs_x100
       FROM avail a JOIN tgt t USING (source), tot"""

  /**
   * One Lloyd (k-means) update iteration over the deterministic IVF cells:
   * per (cell, dim) member count, exact fixed-point sum and floor-mean —
   * the whole step replays bit-for-bit in SQL.
   */
  def kmeansUpdateQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val (assigned, _) = Similarity.ivfAssignSeeded(t(dir, "embeddings"), "vec_id", "embedding", k = 8)
    Similarity.kmeansUpdate(assigned, "embedding")
      .select(col("centroid_id").cast("long").as("centroid_id"),
        col("dim"), col("n_members"), col("sum_e6"), col("centroid_e6"))
  }

  val kmeansUpdateSql: String =
    s"""WITH cent AS (
         SELECT rk - 1 AS centroid_id, embedding AS cv FROM (
           SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) AS rk FROM embeddings)
         WHERE rk <= 8),
       assigned AS (
         SELECT vec_id, embedding, centroid_id FROM (
           SELECT vec_id, embedding, centroid_id,
                  row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) AS rn
           FROM (SELECT e.vec_id, e.qv AS embedding, c.centroid_id, $SqlCos AS cos
                 FROM (SELECT vec_id, embedding AS qv FROM embeddings) e
                 CROSS JOIN (SELECT centroid_id, cv AS nv FROM cent) c))
         WHERE rn = 1),
       exploded AS (
         SELECT centroid_id,
                unnest(range(1, len(embedding) + 1)) AS i,
                unnest(list_transform(embedding, x -> cast(round(cast(x as double) * 1000000, 0) as bigint))) AS v_e6
         FROM assigned),
       agg AS (
         SELECT cast(centroid_id as bigint) AS centroid_id, cast(i - 1 as bigint) AS dim,
                cast(count(*) as bigint) AS n_members, cast(sum(v_e6) as bigint) AS sum_e6
         FROM exploded GROUP BY centroid_id, i)
       SELECT centroid_id, dim, n_members, sum_e6,
              cast((sum_e6 - ((sum_e6 % n_members) + n_members) % n_members) // n_members as bigint) AS centroid_e6
       FROM agg"""

  /**
   * Snapshot diff between two simulated corpus versions: old = ids not
   * divisible by 7; new = ids not divisible by 5, with every 11th document
   * edited — classify added/removed/changed/unchanged per key.
   */
  def snapshotDiffQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents")
    val old = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
    val cur = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"),
        TextAnalysis.fingerprint(
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("fp"))
    graft.ops.Snapshots.diff(old, cur, "doc_id", "fp")
  }

  val snapshotDiffSql: String =
    raw"""WITH o AS (
         SELECT doc_id, md5($Norm) AS ofp FROM documents WHERE doc_id % 7 <> 0),
       n AS (
         SELECT doc_id,
                md5(lower(trim(regexp_replace(
                  CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END,
                  '\s+', ' ', 'g')))) AS nfp
         FROM documents WHERE doc_id % 5 <> 0)
       SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
              CASE WHEN o.doc_id IS NULL THEN 'added'
                   WHEN n.doc_id IS NULL THEN 'removed'
                   WHEN ofp IS DISTINCT FROM nfp THEN 'changed'
                   ELSE 'unchanged' END AS status
       FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id"""

  /**
   * `scd2_history`: SCD Type-2 dimension build
   * ([[graft.ops.Snapshots.scd2FromChangeLog]]) — each user's event_type
   * stream collapsed to versioned validity intervals (gaps-and-islands).
   * One user-keyed shuffle; the island filter preserves partitioning and
   * sort so the lead/version window reuses the exchange. Total order is
   * `(ts, event_id)` on both engines, so version numbering is
   * deterministic even under timestamp collisions.
   */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(
      col("user_id"), col("event_type"), col("ts"), col("event_id"))
    graft.ops.Snapshots
      .scd2FromChangeLog(ev, "user_id", Seq("event_type"), "ts", Seq("event_id"))
      .select(col("user_id"), col("event_type"),
        micros(col("valid_from")).as("valid_from_us"),
        micros(col("valid_to")).as("valid_to_us"),
        col("version"), col("is_current"))
  }

  val scd2HistorySql: String =
    """WITH ordered AS (
         SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
                lag(event_type) OVER (
                  PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
         FROM events),
       starts AS (
         SELECT user_id, event_type, ts_us, event_id FROM ordered
         WHERE prev IS NULL OR prev <> event_type),
       v AS (
         SELECT user_id, event_type, ts_us AS valid_from_us,
                lead(ts_us) OVER (
                  PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us,
                row_number() OVER (
                  PARTITION BY user_id ORDER BY ts_us, event_id) AS version
         FROM starts)
       SELECT user_id, event_type, valid_from_us, valid_to_us,
              cast(version AS bigint) AS version,
              (valid_to_us IS NULL) AS is_current
       FROM v"""

  /**
   * Embedding norm-outlier flags per label (Tukey fences over exact
   * fixed-point norms, discrete quartiles — bit-portable end to end).
   */
  def embeddingOutliers(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    Similarity.normOutliers(t(dir, "embeddings"), "vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("long"))
  }

  val embeddingOutliersSql: String =
    """WITH norms AS (
         SELECT vec_id, cast(label as bigint) AS label,
                cast(round(sqrt(list_sum(list_transform(embedding,
                  x -> cast(x as double) * cast(x as double)))) * 1000000, 0) as bigint) AS norm_e6
         FROM embeddings),
       ranked AS (
         SELECT vec_id, label, norm_e6,
                row_number() OVER (PARTITION BY label ORDER BY norm_e6, vec_id) AS rn,
                count(*) OVER (PARTITION BY label) AS n
         FROM norms),
       quart AS (
         SELECT label,
                max(CASE WHEN rn = (n - 1) * 25 // 100 + 1 THEN norm_e6 END) AS q1,
                max(CASE WHEN rn = (n - 1) * 75 // 100 + 1 THEN norm_e6 END) AS q3
         FROM ranked GROUP BY label)
       SELECT vec_id, label, norm_e6,
              (norm_e6 * 2 < q1 * 2 - (q3 - q1) * 3) OR
              (norm_e6 * 2 > q3 * 2 + (q3 - q1) * 3) AS is_outlier
       FROM ranked JOIN quart USING (label)"""

  /**
   * Forward as-of with a staleness bound: for each purchase, the FIRST
   * signup-aggregate at-or-after it within 30 days, else null.
   */
  def asofForward(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), micros(col("ts")).as("ts_us"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), micros(col("ts")).as("ts_us"))
      .agg(round(max(col("value")), 4).as("signup_value"))
    Joins.asOf(purchases, signups, Seq("user_id"), "ts_us",
      direction = "forward", tolerance = 30L * 86400000000L)
  }

  val asofForwardSql: String =
    """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
                WHERE event_type = 'purchase'),
       s AS (SELECT user_id, epoch_us(ts) AS ts_us, round(max(value), 4) AS signup_value
             FROM events WHERE event_type = 'signup' GROUP BY 1, 2),
       m AS (SELECT p.event_id, min(s.ts_us) AS m_ts
             FROM p LEFT JOIN s ON p.user_id = s.user_id AND s.ts_us >= p.ts_us
             GROUP BY p.event_id)
       SELECT p.user_id, p.ts_us, p.event_id,
              CASE WHEN m.m_ts - p.ts_us <= 30 * 86400000000 THEN s2.signup_value END
                AS asof_signup_value
       FROM p JOIN m USING (event_id)
       LEFT JOIN s s2 ON s2.user_id = p.user_id AND s2.ts_us = m.m_ts"""

  /**
   * `asof_nearest`: for each purchase, the CLOSEST signup-aggregate in
   * absolute time, either side, ties backward ([[Joins.asOf]] with
   * `direction = "nearest"` — the last pandas `merge_asof` direction).
   * The oracle is the naive definition: rank all (purchase, signup)
   * pairs per purchase by `(abs distance, signup ts)` and keep rank 1 —
   * the `signup ts` tiebreak IS the backward preference (at equal
   * distance the earlier row is the backward one).
   */
  def asofNearest(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), micros(col("ts")).as("ts_us"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), micros(col("ts")).as("ts_us"))
      .agg(round(max(col("value")), 4).as("signup_value"))
    Joins.asOf(purchases, signups, Seq("user_id"), "ts_us", direction = "nearest")
  }

  val asofNearestSql: String =
    """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
                WHERE event_type = 'purchase'),
       s AS (SELECT user_id, epoch_us(ts) AS ts_us, round(max(value), 4) AS signup_value
             FROM events WHERE event_type = 'signup' GROUP BY 1, 2),
       d AS (SELECT p.event_id, p.user_id, p.ts_us, s.ts_us AS s_ts, s.signup_value,
                    abs(p.ts_us - s.ts_us) AS dist
             FROM p LEFT JOIN s ON p.user_id = s.user_id),
       r AS (SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY dist, s_ts) AS rn
             FROM d)
       SELECT user_id, ts_us, event_id, signup_value AS asof_signup_value
       FROM r WHERE rn = 1"""

  /**
   * Keep-best exact dedup: of identical normalized texts, keep the
   * highest-scored document (ties: smallest doc_id) — the curation-flavored
   * keeper. The corpus is unioned with an uppercased, higher-scored copy of
   * itself so every document has a duplicate family and the keeper choice
   * is actually exercised (the copies must win).
   */
  def dedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents").select(col("doc_id"), col("text"), col("source"), col("n_chars"))
    // copy ids live in the negative range: disjoint from real (non-negative)
    // doc_ids at ANY scale factor, so no accidental key collision can ever
    // create an exact (score, key) tie with a nondeterministic keeper
    val copies = docs.select((-col("doc_id") - 1).as("doc_id"), upper(col("text")).as("text"),
      lit("copy").as("source"), (col("n_chars") + 1).as("n_chars"))
    Dedup.exactKeepBest(docs.unionByName(copies), "text", "n_chars", "doc_id")
      .select(col("doc_id"), col("source"), col("n_chars"))
  }

  val dedupKeepBestSql: String =
    s"""WITH corpus AS (
         SELECT doc_id, text, source, n_chars FROM documents
         UNION ALL
         SELECT -doc_id - 1, upper(text), 'copy', n_chars + 1 FROM documents)
       SELECT doc_id, source, n_chars FROM (
         SELECT doc_id, source, n_chars,
                row_number() OVER (
                  PARTITION BY md5($Norm)
                  ORDER BY n_chars DESC, doc_id) AS rn
         FROM corpus)
       WHERE rn = 1"""

  /**
   * Mergeable distinct-user rollup: daily HLL sketches per event type,
   * re-aggregated to all-time per type by sketch union — never re-reading
   * events. No SQL oracle (the estimate is approximate by design; DuckDB
   * has no DataSketches twin): the driver records a rows-only check, and
   * SketchesSpec pins accuracy + exact merge equality.
   */
  def distinctUsersSketch(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(col("event_type"),
      to_date(col("ts").cast("timestamp")).as("day"), col("user_id"))
    val daily = graft.ops.Sketches.distinctRollup(ev, Seq("event_type", "day"), "user_id")
    graft.ops.Sketches.reRollup(daily, Seq("event_type"))
      .select(col("event_type"), col("distinct_est"))
  }

  /**
   * Exact twin of [[distinctUsersSketch]]: the same per-type distinct-user
   * rollup computed with an exact `count(distinct)`, so the sketch query
   * has a driver-checkable anchor (SketchesSpec additionally bounds the
   * estimate against this exact value within HLL error).
   */
  def distinctUsersExact(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    events(dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("distinct_users"))
  }

  val distinctUsersExactSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS distinct_users
       FROM events GROUP BY event_type"""

  /**
   * Mergeable quantile rollup via the deterministic bottom-k (KMV) sample:
   * daily sketches per event type re-rolled to all-time, then p50/p90/p99
   * read off the sample ([[graft.ops.Sketches.quantileSketch]]). Because
   * the sample is a pure function of md5 ranks, the merge is EXACT and the
   * DuckDB oracle replays the identical sample — an approximate-quantile
   * pipeline with a hash-checkable answer.
   */
  def valueQuantilesSketch(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(col("event_type"),
      to_date(col("ts").cast("timestamp")).as("day"), col("event_id"), col("value"))
    val daily = graft.ops.Sketches.quantileSketch(
      ev, Seq("event_type", "day"), "event_id", "value", k = 128)
    val total = graft.ops.Sketches.reRollupQuantileSketch(daily, Seq("event_type"), k = 128)
    total.select(col("event_type"),
      round(graft.ops.Sketches.quantileFromSketch(col("q_sample"), 0.5), 4).as("p50"),
      round(graft.ops.Sketches.quantileFromSketch(col("q_sample"), 0.9), 4).as("p90"),
      round(graft.ops.Sketches.quantileFromSketch(col("q_sample"), 0.99), 4).as("p99"))
  }

  val valueQuantilesSketchSql: String =
    """WITH ranked AS (
         SELECT event_type, value,
                row_number() OVER (
                  PARTITION BY event_type
                  ORDER BY md5(cast(event_id AS varchar))) AS rn
         FROM events),
       s AS (
         SELECT event_type,
                list_sort(list_filter(list(value), x -> x IS NOT NULL)) AS vs
         FROM ranked WHERE rn <= 128 GROUP BY event_type)
       SELECT event_type,
              round(vs[greatest(cast(ceil(0.5 * len(vs)) AS int), 1)], 4) AS p50,
              round(vs[greatest(cast(ceil(0.9 * len(vs)) AS int), 1)], 4) AS p90,
              round(vs[greatest(cast(ceil(0.99 * len(vs)) AS int), 1)], 4) AS p99
       FROM s"""

  /**
   * `heavy_hitters_sketch`: the full Misra-Gries pipeline — DAILY
   * heavy-hitter summaries over user_id per event type
   * ([[graft.ops.Sketches.heavyHittersRollup]]), MERGED to all-time
   * ([[reRollupHeavyHitters]]), top 10 reported. Capacity 4096 covers
   * every distinct user at any test SF, so the sketch runs in its EXACT
   * regime and the whole daily-merge-report chain hash-matches plain SQL
   * counts — the same L38/L38b anchoring idea with the anchor fused into
   * the query itself; SketchesSpec separately pins the approximate-regime
   * error bound and merge invariance, which no SQL oracle can express.
   */
  def heavyHittersSketch(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(col("event_type"),
      to_date(col("ts").cast("timestamp")).as("day"), col("user_id"))
    val daily = graft.ops.Sketches.heavyHittersRollup(
      ev, Seq("event_type", "day"), "user_id", capacity = 4096)
    val total = graft.ops.Sketches.reRollupHeavyHitters(daily, Seq("event_type"), capacity = 4096)
    graft.ops.Sketches.topHeavyHitters(total, k = 10)
  }

  val heavyHittersSketchSql: String =
    """WITH counts AS (
         SELECT event_type, cast(user_id AS varchar) AS key, count(*) AS cnt
         FROM events GROUP BY 1, 2),
       ranked AS (
         SELECT event_type, key, cnt,
                row_number() OVER (
                  PARTITION BY event_type ORDER BY cnt DESC, key) AS rank
         FROM counts)
       SELECT event_type, key, cnt, cast(rank AS bigint) AS rank
       FROM ranked WHERE rank <= 10"""

  /**
   * `cms_counts`: the full count-min pipeline — DAILY sketches of
   * event_type ([[graft.ops.Sketches.cmsRollup]]), merged to all-time by
   * EXACT element-wise addition ([[reRollupCms]]), then point estimates
   * for every observed type against the single merged grid. With ~20
   * distinct types in a 1024-wide, depth-4 grid the probability of any
   * type colliding with another in ALL 4 hash rows is ~1e-12, so the
   * sketch runs in its exact regime and the whole build-merge-estimate
   * chain hash-matches plain SQL counts (the L38/L38b anchoring pattern);
   * SketchesSpec pins the collision-regime overestimate bound and the
   * bit-exact merge, which no SQL oracle can express.
   */
  def cmsCounts(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(col("event_type"),
      to_date(col("ts").cast("timestamp")).as("day"))
    val daily = graft.ops.Sketches.cmsRollup(ev, Seq("day"), "event_type")
    val total = graft.ops.Sketches.reRollupCms(daily, Seq.empty)
    ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(total))
      .select(col("event_type"),
        graft.ops.Sketches.cmsEstimate(col("cms"), col("event_type")).as("est"))
  }

  val cmsCountsSql: String =
    """SELECT event_type, count(*) AS est FROM events GROUP BY event_type"""

  /**
   * `embedding_drift`: [[graft.ops.Drift.embeddingDriftFromMeans]] over
   * even/odd snapshot slices of the embeddings table, the odd slice
   * re-encoded with a synthetic 1.1x scale regression — the centroid
   * cosine stays near 1 (direction unchanged) while the norm ratio
   * surfaces the scale drift cosine is blind to. All mean/dot/norm sums
   * are exact e6 fixed-point longs, so the verdict hash-matches.
   */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val emb = t(dir, "embeddings")
    val old = emb.filter(col("vec_id") % 2 === 0).select(col("embedding").as("e"))
    val cur = emb.filter(col("vec_id") % 2 === 1)
      .select(transform(col("embedding"), x => x.cast("double") * 1.1).as("e"))
    graft.ops.Drift.embeddingDriftFromMeans(
      graft.ops.Drift.meanVector(old, "e"), graft.ops.Drift.meanVector(cur, "e"))
  }

  val embeddingDriftSql: String = {
    def means(where: String, xform: String) =
      s"""SELECT dim, count(*) AS n,
         cast(sum(v_e6) as hugeint) AS s
         FROM (SELECT unnest(range(0, len(embedding))) AS dim,
                      unnest(list_transform(embedding, x -> cast(round($xform * 1000000, 0) as bigint))) AS v_e6
               FROM embeddings WHERE $where)
         GROUP BY dim"""
    s"""WITH om0 AS (${means("vec_id % 2 = 0", "cast(x as double)")}),
       nm0 AS (${means("vec_id % 2 = 1", "cast(x as double) * 1.1")}),
       om AS (SELECT dim, n, cast((s - ((s % n) + n) % n) // n as bigint) AS m FROM om0),
       nm AS (SELECT dim, n, cast((s - ((s % n) + n) % n) // n as bigint) AS m FROM nm0),
       agg AS (
         SELECT min(o.n) AS n_old, min(c.n) AS n_new,
                sum(cast(o.m as hugeint) * c.m) AS dot,
                sum(cast(o.m as hugeint) * o.m) AS qo,
                sum(cast(c.m as hugeint) * c.m) AS qc
         FROM om o JOIN nm c USING (dim))
       SELECT cast(n_old as bigint) AS n_old, cast(n_new as bigint) AS n_new,
              round(CASE WHEN qo = 0 OR qc = 0 THEN 0
                    ELSE cast(dot as double) / (sqrt(cast(qo as double)) * sqrt(cast(qc as double))) END, 4) AS mean_cosine,
              CASE WHEN qo = 0 THEN NULL
                   ELSE cast(floor(sqrt(cast(qc as double)) / sqrt(cast(qo as double)) * 10000) as bigint) END AS norm_ratio_x10000
       FROM agg"""
  }

  /**
   * Token-distribution drift between corpus snapshots: the same old/cur
   * slices as `snapshot_diff` (doc_id % 7 / % 5, with the % 11 "v2" text
   * rewrite in cur), every term's exact integer-ppm frequency both sides,
   * top 20 by absolute ppm change ([[graft.ops.Drift.vocabDrift]]). The
   * "v2" token shows up as a pure addition (ppm_old = 0).
   */
  def vocabDriftQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents")
    val old = docs.filter(col("doc_id") % 7 =!= 0)
    val cur = docs.filter(col("doc_id") % 5 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
    graft.ops.Drift.vocabDrift(old, cur, "text", k = 20)
  }

  val vocabDriftSql: String =
    s"""WITH oldc AS (
         SELECT t AS term, count(*) AS cnt_old FROM (
           SELECT unnest($Toks) AS t FROM documents WHERE doc_id % 7 <> 0)
         GROUP BY 1),
       curd AS (
         SELECT CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
         FROM documents WHERE doc_id % 5 <> 0),
       curc AS (
         SELECT t AS term, count(*) AS cnt_cur FROM (
           SELECT unnest($Toks) AS t FROM curd)
         GROUP BY 1),
       tot AS (SELECT greatest(coalesce((SELECT sum(cnt_old) FROM oldc), 0), 1) AS tot_old,
                      greatest(coalesce((SELECT sum(cnt_cur) FROM curc), 0), 1) AS tot_cur),
       j AS (
         SELECT coalesce(o.term, c.term) AS term,
                coalesce(cnt_old, 0) AS cnt_old, coalesce(cnt_cur, 0) AS cnt_cur
         FROM oldc o FULL OUTER JOIN curc c ON o.term = c.term)
       SELECT term, ppm_old, ppm_cur, ppm_cur - ppm_old AS delta_ppm FROM (
         SELECT term,
                cast(cast(cnt_old AS hugeint) * 1000000 // tot_old AS bigint) AS ppm_old,
                cast(cast(cnt_cur AS hugeint) * 1000000 // tot_cur AS bigint) AS ppm_cur
         FROM j, tot)
       ORDER BY abs(ppm_cur - ppm_old) DESC, term LIMIT 20"""

  /**
   * `concurrency_profile`: sweep-line interval analytics
   * ([[graft.ops.Intervals.concurrency]]) — orders as 7-day validity
   * windows, one row per boundary with the EXACT number of concurrently
   * open orders after it. The running sum is the no-one-reducer global
   * scan (range repartition + per-partition offsets); the oracle is the
   * naive single-window running sum — the hash match IS the
   * distributed-equals-definition proof, same as the global-rank family.
   */
  def concurrencyProfile(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val us = unix_micros(col("o_orderdate").cast("timestamp"))
    val iv = t(dir, "orders").select(col("o_orderkey").as("id"),
      us.as("start_us"), (us + 7L * 86400 * 1000000).as("end_us"))
    graft.ops.Intervals.concurrency(iv, "start_us", "end_us", "id")
      .select(col("ts").as("ts_us"), col("delta"), col("id"), col("active"))
  }

  val concurrencyProfileSql: String =
    """WITH b AS (
         SELECT epoch_us(o_orderdate) AS ts_us, 1 AS delta, o_orderkey AS id FROM orders
         UNION ALL
         SELECT epoch_us(o_orderdate) + 604800000000, -1, o_orderkey FROM orders)
       SELECT ts_us, CAST(delta AS BIGINT) AS delta, id,
              CAST(sum(delta) OVER (ORDER BY ts_us, delta, id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS active
       FROM b"""

  /**
   * `record_days`: record-breaking revenue days — days whose total
   * strictly exceeds EVERY earlier day, with the previous best attached
   * ([[graft.ops.Intervals.withRunningMaxBefore]] — the exclusive
   * best-so-far scan with no one-reducer window). The first day is a
   * record by definition (null previous best).
   */
  def recordDays(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val daily = t(dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(sum(cents(col("o_totalprice"))).as("rev_cents"))
    graft.ops.Intervals.withRunningMaxBefore(daily, "prev_best", "rev_cents", col("day"))
      .where(col("prev_best").isNull || col("rev_cents") > col("prev_best"))
  }

  val recordDaysSql: String =
    s"""WITH daily AS (
         SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                sum(${sqlCents("o_totalprice")}) AS rev_cents
         FROM orders GROUP BY 1),
       scanned AS (
         SELECT day, CAST(rev_cents AS BIGINT) AS rev_cents,
                CAST(max(rev_cents) OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT) AS prev_best
         FROM daily)
       SELECT day, rev_cents, prev_best FROM scanned
       WHERE prev_best IS NULL OR rev_cents > prev_best"""

  /** Shared per-nation daily-revenue frame for the series operators. */
  private def nationDaily(dir: String)(implicit spark: SparkSession): DataFrame =
    t(dir, "orders")
      .join(t(dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
          .cast("long").as("day_idx"))
      .agg(sum(cents(col("o_totalprice"))).as("rev_cents"))

  private val sqlNationDaily: String =
    s"""SELECT n_name,
              CAST(datediff('day', DATE '1992-01-01', cast(o_orderdate as date)) AS BIGINT) AS day_idx,
              CAST(sum(${sqlCents("o_totalprice")}) AS BIGINT) AS rev_cents
       FROM orders JOIN customer ON o_custkey = c_custkey
                   JOIN nation ON c_nationkey = n_nationkey
       GROUP BY 1, 2"""

  /**
   * `gap_fill`: per-nation daily revenue DENSIFIED over each nation's
   * observed span with last-observation-carried-forward
   * ([[graft.ops.Timeseries.gapFill]]) — the calendar completion every
   * downstream window/report assumes; ~3 in 4 nation-days at sf0.01 are
   * gaps, so the explode and the carry are both genuinely exercised.
   * Per-KEY ordered windows only (one hash exchange on the nation);
   * nothing global.
   */
  def gapFillRevenue(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.Timeseries.gapFill(nationDaily(dir), Seq("n_name"), "day_idx",
      Seq("rev_cents"))
  }

  val gapFillRevenueSql: String =
    s"""WITH daily AS ($sqlNationDaily),
       spans AS (SELECT n_name, min(day_idx) AS d0, max(day_idx) AS d1
                 FROM daily GROUP BY 1),
       cal AS (SELECT n_name, unnest(generate_series(d0, d1)) AS day_idx FROM spans),
       j AS (SELECT c.n_name, c.day_idx, d.rev_cents,
                    d.rev_cents IS NULL AS was_gap
             FROM cal c LEFT JOIN daily d
               ON c.n_name = d.n_name AND c.day_idx = d.day_idx)
       SELECT n_name, day_idx, rev_cents,
              last_value(rev_cents IGNORE NULLS) OVER (
                PARTITION BY n_name ORDER BY day_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rev_cents_filled,
              was_gap
       FROM j"""

  /**
   * `ewma_revenue`: alpha = 1/2 EWMA of per-nation daily revenue,
   * truncated at 7 calendar lags in EXACT fixed point
   * ([[graft.ops.Timeseries.truncatedEwma]] — power-of-two weights, so
   * every term is an integer and the whole smoothing replays
   * digit-for-digit in the oracle's naive windowed self-join). Bounded
   * 8x fan-out + ONE (nation, day) aggregation; no windows at all.
   */
  def ewmaRevenue(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.Timeseries.truncatedEwma(nationDaily(dir), Seq("n_name"),
      "day_idx", "rev_cents", lags = 7)
  }

  val ewmaRevenueSql: String =
    s"""WITH daily AS ($sqlNationDaily)
       SELECT t.n_name, t.day_idx, t.rev_cents,
              CAST(sum(CAST(1 << (7 - (t.day_idx - s.day_idx)) AS HUGEINT) * s.rev_cents) * 1000
                   // sum(CAST(1 << (7 - (t.day_idx - s.day_idx)) AS HUGEINT)) AS BIGINT) AS ewma_milli
       FROM daily t JOIN daily s
         ON t.n_name = s.n_name AND s.day_idx BETWEEN t.day_idx - 7 AND t.day_idx
       GROUP BY 1, 2, 3"""

  /**
   * `lag_correlation`: lead/lag screen between the daily `view` and
   * `purchase` event-count series — for each lag 0..7, the exact-ppm OLS
   * fit of purchases(day + lag) on views(day)
   * ([[graft.ops.Timeseries.lagCorrelation]], finishing through
   * [[graft.ops.Stats.olsFromSums]]'s staged integer arithmetic). The
   * raw events collapse to day-sized frames BEFORE the 8x lag fan-out
   * and the one join — at 100 TB the fan-out rides thousands of rows,
   * not billions.
   */
  def lagCorrelation(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val daily = events(dir)
      .groupBy(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000").as("day_idx"))
      .agg(count(lit(1)).as("cnt"))
    val views = daily.where(col("event_type") === "view")
      .select(col("day_idx"), col("cnt").as("views"))
    val purchases = daily.where(col("event_type") === "purchase")
      .select(col("day_idx"), col("cnt").as("purchases"))
    graft.ops.Timeseries.lagCorrelation(views, purchases, "day_idx",
      "views", "purchases", maxLag = 7)
  }

  val lagCorrelationSql: String =
    """WITH daily AS (
         SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx, count(*) AS cnt
         FROM events GROUP BY 1, 2),
       v AS (SELECT day_idx, cnt AS x FROM daily WHERE event_type = 'view'),
       p AS (SELECT day_idx, cnt AS y FROM daily WHERE event_type = 'purchase'),
       lags AS (SELECT unnest(generate_series(0, 7)) AS lag),
       j AS (SELECT l.lag, v.x, p.y
             FROM v CROSS JOIN lags l JOIN p ON v.day_idx + l.lag = p.day_idx),
       s AS (SELECT lag, CAST(count(*) AS HUGEINT) AS n,
                    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
                    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
             FROM j GROUP BY lag),
       d AS (SELECT lag, n, sx, sy,
                    n * sxx - sx * sx AS dxx,
                    n * sxy - sx * sy AS dxy,
                    n * syy - sy * sy AS dyy
             FROM s)
       SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
         CAST(CASE WHEN dxx = 0 THEN NULL
              ELSE dxy * 1000000 // dxx END AS BIGINT) AS slope_ppm,
         CAST(CASE WHEN dxx = 0 THEN NULL
              ELSE (sy * 1000000 - (dxy * 1000000 // dxx) * sx) // n
              END AS BIGINT) AS intercept_ppm,
         CAST(CASE WHEN dxx = 0 OR dyy = 0 THEN NULL
              ELSE (dxy * 1000000 // dxx) * (dxy * 1000000000 // dyy) // 1000000000
              END AS BIGINT) AS r2_ppm
       FROM d"""

  /**
   * `zorder_parts`: the Z-order (Morton) layout key over part
   * (size, retail cents) ([[graft.ops.Layout.zOrderKey]], 8 bits per
   * dimension, equi-depth cells from exact global ranks) — sort-and-write
   * by this key and per-file min/max statistics prune 2-D selective
   * scans. The oracle replays rank, bucket and every interleaved bit, so
   * the hash match pins the full curve byte-for-byte.
   */
  def zorderParts(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val parts = t(dir, "part").select(col("p_partkey"),
      col("p_size").cast("long").as("size"),
      cents(col("p_retailprice")).as("price_cents"))
    graft.ops.Layout.zOrderKey(parts, Seq("size", "price_cents"), bits = 8,
      tie = Seq(col("p_partkey")))
  }

  val zorderPartsSql: String = {
    val interleave = (0 until 8).flatMap(i => Seq(
      s"(((b0 >> $i) & 1) << ${2 * i + 1})",
      s"(((b1 >> $i) & 1) << ${2 * i})")).mkString(" + ")
    s"""WITH p AS (
         SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
                ${sqlCents("p_retailprice")} AS price_cents
         FROM part),
       r AS (SELECT *, row_number() OVER (ORDER BY size, p_partkey) AS r0,
                    row_number() OVER (ORDER BY price_cents, p_partkey) AS r1,
                    count(*) OVER () AS n FROM p),
       b AS (SELECT p_partkey, size, price_cents,
                    (r0 - 1) * 256 // n AS b0, (r1 - 1) * 256 // n AS b1 FROM r)
       SELECT p_partkey, size, price_cents, CAST($interleave AS BIGINT) AS z_key
       FROM b"""
  }

  /**
   * `type_diversity`: per-user Gini-Simpson diversity of event types in
   * exact ppm ([[graft.ops.DataQuality.giniDiversity]]) — the
   * no-logarithm concentration screen (0 = single-type user, toward 8e5
   * as the five types even out). Two map-side-combined aggregations.
   */
  def typeDiversity(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.DataQuality.giniDiversity(events(dir), Seq("user_id"), "event_type")
  }

  val typeDiversitySql: String =
    """WITH c AS (SELECT user_id, event_type, CAST(count(*) AS HUGEINT) AS cnt
                  FROM events GROUP BY 1, 2),
       g AS (SELECT user_id, sum(cnt * cnt) AS ss, sum(cnt) AS n FROM c GROUP BY 1)
       SELECT user_id, CAST(n AS BIGINT) AS n,
              CAST(1000000 - ss * 1000000 // (n * n) AS BIGINT) AS diversity_ppm
       FROM g"""

  /**
   * `cusum_revenue`: Page's CUSUM change-point regime over the
   * ZERO-FILLED per-nation daily revenue series
   * ([[graft.ops.Timeseries.cusum]] on [[graft.ops.Timeseries.gapFill]]
   * output — calendar gaps are genuinely zero-revenue days, so they
   * count against the drift allowance). Allowance and threshold are
   * integer multiples of the global calendar-day mean (computed exactly,
   * broadcast as one row), so the test is scale-free: 2x mean per day
   * tolerated, alarm when the cumulative excess tops 30 mean-days. The
   * exact distributed form is `S = P - min(0, running min of P)` — two
   * per-KEY windows, no sequential state.
   */
  def cusumRevenue(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    // densified frame feeds the mean agg AND the cusum branch: materialize
    // so the gapFill join/window chain runs once, not per consumer
    val filled = graft.ops.Timeseries.gapFill(nationDaily(dir), Seq("n_name"),
        "day_idx", Seq("rev_cents"))
      .select(col("n_name"), col("day_idx"),
        coalesce(col("rev_cents"), lit(0L)).as("rev"))
      .localCheckpoint(true)
    val mean = filled.agg(
      expr("CAST(sum(rev) DIV count(*) AS BIGINT)").as("__mean"))
    graft.ops.Timeseries.cusum(filled.crossJoin(broadcast(mean)),
        Seq("n_name"), "day_idx", "rev",
        col("__mean") * 2, col("__mean") * 30)
      .drop("__mean")
  }

  val cusumRevenueSql: String =
    s"""WITH daily AS ($sqlNationDaily),
       spans AS (SELECT n_name, min(day_idx) AS d0, max(day_idx) AS d1
                 FROM daily GROUP BY 1),
       cal AS (SELECT n_name, unnest(generate_series(d0, d1)) AS day_idx FROM spans),
       j AS (SELECT c.n_name, c.day_idx, coalesce(d.rev_cents, 0) AS rev
             FROM cal c LEFT JOIN daily d
               ON c.n_name = d.n_name AND c.day_idx = d.day_idx),
       m AS (SELECT sum(rev) // count(*) AS mean FROM j),
       p AS (SELECT n_name, day_idx, rev, mean,
                    sum(rev - 2 * mean) OVER (
                      PARTITION BY n_name ORDER BY day_idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
             FROM j CROSS JOIN m),
       sline AS (SELECT n_name, day_idx, rev, mean,
                    CAST(pp - least(0, min(pp) OVER (
                      PARTITION BY n_name ORDER BY day_idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT) AS cusum
             FROM p)
       SELECT n_name, day_idx, rev, cusum, cusum > 30 * mean AS alarm
       FROM sline"""

  /**
   * `dow_profile`: exact day-of-week seasonal index of per-nation
   * revenue ([[graft.ops.Timeseries.seasonalIndex]], period 7 over the
   * 1992-01-01-relative day index) — the cross-multiplied integer form
   * `sum_phase * n_total * 1e6 DIV (n_phase * sum_total)` never divides
   * early, so the index replays digit-for-digit. Phase/key-sized frames
   * only; scan-bound at any scale.
   */
  def dowProfile(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.Timeseries.seasonalIndex(nationDaily(dir), Seq("n_name"),
      "day_idx", "rev_cents", period = 7)
  }

  val dowProfileSql: String =
    s"""WITH daily AS ($sqlNationDaily),
       phased AS (
         SELECT n_name, day_idx % 7 AS phase,
                CAST(count(*) AS HUGEINT) AS np,
                CAST(sum(CAST(rev_cents AS HUGEINT)) AS HUGEINT) AS sp
         FROM daily GROUP BY 1, 2),
       totals AS (SELECT n_name, sum(np) AS nt, sum(sp) AS st
                  FROM phased GROUP BY 1)
       SELECT p.n_name, p.phase, CAST(np AS BIGINT) AS n,
              CAST(sp AS BIGINT) AS value_sum,
              CAST(CASE WHEN st = 0 THEN NULL
                   ELSE sp * nt * 1000000 // (np * st) END AS BIGINT) AS idx_ppm
       FROM phased p JOIN totals t ON p.n_name = t.n_name"""

  /**
   * `trailing_revenue`: trailing-7-CALENDAR-day revenue per nation
   * ([[graft.ops.Timeseries.trailing]] — a RANGE window on the day
   * index, so the ~75% missing nation-days genuinely shrink the trailing
   * set instead of being silently stretched over by a ROWS frame). Sum,
   * count and the exact-milli average per observed day; one key
   * exchange.
   */
  def trailingRevenue(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.Timeseries.trailing(nationDaily(dir), Seq("n_name"),
      "day_idx", "rev_cents", window = 7)
  }

  val trailingRevenueSql: String =
    s"""WITH daily AS ($sqlNationDaily)
       SELECT n_name, day_idx, rev_cents,
              CAST(sum(rev_cents) OVER w AS BIGINT) AS trailing_sum,
              CAST(count(rev_cents) OVER w AS BIGINT) AS trailing_n,
              CAST(sum(CAST(rev_cents AS HUGEINT)) OVER w * 1000
                   // count(rev_cents) OVER w AS BIGINT) AS trailing_avg_milli
       FROM daily
       WINDOW w AS (PARTITION BY n_name ORDER BY day_idx
                    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)"""

  /**
   * `value_histogram`: exact equal-width 20-bin histogram of order value
   * cents ([[graft.ops.DataQuality.histogram]]) — integer bucket edges
   * from the observed min/max, so the shape profile replays
   * digit-for-digit (a float-width histogram cannot). One 1-row min/max
   * broadcast + one <=20-key count agg: scan-bound at any scale.
   */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.DataQuality.histogram(
      t(dir, "orders").select(cents(col("o_totalprice")).as("v")), "v", bins = 20)
  }

  val valueHistogramSql: String =
    s"""WITH vals AS (
         SELECT ${sqlCents("o_totalprice")} AS v FROM orders
         WHERE o_totalprice IS NOT NULL),
       e AS (SELECT min(v) AS mn, (max(v) - min(v) + 20) // 20 AS w FROM vals),
       g AS (SELECT (v - mn) // w AS bin, count(*) AS n
             FROM vals CROSS JOIN e GROUP BY 1)
       SELECT bin, CAST(mn + bin * w AS BIGINT) AS bin_lo,
              CAST(mn + bin * w + w - 1 AS BIGINT) AS bin_hi, n
       FROM g CROSS JOIN e"""

  /**
   * `anchor_texts`: the anchor-text corpus per target host — for each
   * link-graph destination, total inlink count and the MODE anchor text
   * with its count ([[graft.ops.Stats.modeBy]] — deterministic tie law:
   * highest count, then largest anchor in binary order; `max_by` alone
   * would be tie-nondeterministic and hash-diverge). What anchors say
   * about a page is a classic relevance/quality signal
   * (Common-Crawl-style); the whole chain — extraction, host parse,
   * counts, argmax — is host/anchor-sized after the scan.
   */
  def anchorTexts(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val pages = t(dir, "documents").select(col("doc_id"), linkPageHtml.as("html"))
    val pairs = Web.extractLinks(pages, "doc_id", "html")
      .select(Web.urlHost(col("href")).as("host"), col("anchor"))
      .where(col("host").isNotNull)
    // ONE scan: the (host, anchor) counts feed both totals and the argmax
    // (host/anchor-sized, checkpointed for its two consumers)
    val counts = pairs.groupBy(col("host"), col("anchor"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val totals = counts.groupBy(col("host"))
      .agg(sum(col("cnt")).cast("long").as("n_links"))
    graft.ops.Stats.modeFromCounts(counts, Seq("host"), "anchor")
      .withColumnRenamed("mode", "top_anchor")
      .withColumnRenamed("mode_n", "top_anchor_n")
      .join(totals, Seq("host"))
  }

  /** Lazy: references `sqlLinkPages`/`sqlAnchorPat`, declared LATER in this
    * object — an eager val here would interpolate them as null (init order). */
  lazy val anchorTextsSql: String =
    s"""WITH $sqlLinkPages,
       ex AS (
         SELECT doc_id,
           regexp_extract_all(html, '$sqlAnchorPat', 1) AS hrefs,
           regexp_extract_all(html, '$sqlAnchorPat', 2) AS anchors
         FROM pages),
       l AS (SELECT unnest(hrefs) AS href, unnest(anchors) AS anchor FROM ex),
       h AS (
         SELECT lower(regexp_replace(regexp_extract(regexp_replace(href, '#.*', '', 'g'),
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), ':[0-9]+$$', '', 'g')) AS host,
           anchor
         FROM l),
       c AS (SELECT host, anchor, count(*) AS cnt FROM h
             WHERE host IS NOT NULL GROUP BY 1, 2),
       m AS (SELECT host, anchor, cnt,
                    row_number() OVER (PARTITION BY host
                      ORDER BY cnt DESC, anchor DESC) AS rk FROM c),
       t AS (SELECT host, CAST(sum(cnt) AS BIGINT) AS n_links FROM c GROUP BY 1)
       SELECT t.host, m.anchor AS top_anchor, CAST(m.cnt AS BIGINT) AS top_anchor_n,
              n_links
       FROM t JOIN m ON t.host = m.host AND m.rk = 1"""

  /**
   * `pareto_parts`: the 2-D Pareto front of PROMO parts — biggest size
   * for the lowest price ([[graft.ops.Stats.paretoFront2D]], price
   * negated to minimize). The oracle is the NAIVE all-pairs dominance
   * NOT EXISTS over the same slice, so the hash match proves the sweep
   * (group-best + exclusive running max over size descending) IS the
   * skyline definition — the no-all-pairs form survives any scale, the
   * naive form is the proof.
   */
  def paretoParts(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val parts = t(dir, "part").filter(col("p_type").startsWith("PROMO"))
      .select(col("p_partkey"), col("p_size").cast("long").as("size"),
        cents(col("p_retailprice")).as("price_cents"))
      .withColumn("__negp", -col("price_cents"))
    graft.ops.Stats.paretoFront2D(parts, "size", "__negp").drop("__negp")
  }

  val paretoPartsSql: String =
    s"""WITH p AS (
         SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
                ${sqlCents("p_retailprice")} AS price_cents
         FROM part WHERE p_type LIKE 'PROMO%')
       SELECT p_partkey, size, price_cents FROM p a
       WHERE NOT EXISTS (
         SELECT 1 FROM p b
         WHERE b.size >= a.size AND b.price_cents <= a.price_cents
           AND (b.size > a.size OR b.price_cents < a.price_cents))"""

  /**
   * `rfm_segments`: classic RFM (recency / frequency / monetary)
   * customer segmentation with EXACT tercile buckets — one customer agg,
   * then three independent global ranks through the no-one-reducer
   * range-partition recipe ([[graft.ops.TextAnalysis.withGlobalRank]]),
   * bucket = `(rank - 1) * 3 DIV n` with ties broken by customer key (a
   * pure function of the data — `ntile` leaves tie placement
   * implementation-defined, so the oracle replays row_number with the
   * same total order instead). Segment string "rfm" concatenates the
   * three digits, 2 = top tercile.
   */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val base = t(dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(
        max(datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")))
          .cast("long").as("rec"),
        count(lit(1)).as("freq"),
        sum(cents(col("o_totalprice"))).as("mon"))
    val total = base.agg(count(lit(1)).as("__n"))
    var out = base.join(broadcast(total))
    for ((c, b) <- Seq(("rec", "r_bucket"), ("freq", "f_bucket"), ("mon", "m_bucket"))) {
      out = graft.ops.TextAnalysis
        .withGlobalRank(out, "__rk", col(c), col("o_custkey"))
        .withColumn(b, expr("(__rk - 1) * 3 DIV __n"))
        .drop("__rk")
    }
    out.drop("__n")
      .withColumn("segment",
        concat(col("r_bucket").cast("string"), col("f_bucket").cast("string"),
          col("m_bucket").cast("string")))
  }

  val rfmSegmentsSql: String =
    s"""WITH base AS (
         SELECT o_custkey,
                CAST(max(datediff('day', DATE '1970-01-01', cast(o_orderdate as date))) AS BIGINT) AS rec,
                count(*) AS freq,
                sum(${sqlCents("o_totalprice")}) AS mon
         FROM orders GROUP BY o_custkey),
       t AS (SELECT count(*) AS n FROM base),
       r AS (
         SELECT o_custkey, rec, freq, mon,
                row_number() OVER (ORDER BY rec, o_custkey) AS rk_r,
                row_number() OVER (ORDER BY freq, o_custkey) AS rk_f,
                row_number() OVER (ORDER BY mon, o_custkey) AS rk_m
         FROM base)
       SELECT o_custkey, rec, freq, CAST(mon AS BIGINT) AS mon,
              CAST((rk_r - 1) * 3 // n AS BIGINT) AS r_bucket,
              CAST((rk_f - 1) * 3 // n AS BIGINT) AS f_bucket,
              CAST((rk_m - 1) * 3 // n AS BIGINT) AS m_bucket,
              CAST((rk_r - 1) * 3 // n AS VARCHAR) ||
              CAST((rk_f - 1) * 3 // n AS VARCHAR) ||
              CAST((rk_m - 1) * 3 // n AS VARCHAR) AS segment
       FROM r CROSS JOIN t"""

  /**
   * `basket_lift`: market-basket brand affinity — for every pair of part
   * brands co-occurring in an order, exact support / confidence / lift in
   * ppm. The pair expansion is a self-equi-join ON THE ORDER KEY of the
   * per-order DISTINCT brand set, so fan-out is bounded by
   * (brands-per-order)², never corpus-sized; brand marginals and the
   * 1-row order total broadcast back. Lift > 1e6 = brands bought together
   * more than independence predicts. All divisions truncated integer ppm,
   * replayed in HUGEINT.
   */
  def basketLift(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    // (order, brand) distinct is read FOUR times (both pair sides, the
    // marginals, the total) — materialize once instead of re-running the
    // lineitem scan + distinct per consumer
    val ob = t(dir, "lineitem")
      .join(broadcast(t(dir, "part")), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
      .distinct()
      .localCheckpoint(true)
    val pairs = ob.select(col("ok"), col("brand").as("brand_a"))
      .join(ob.select(col("ok"), col("brand").as("brand_b")), Seq("ok"))
      .where(col("brand_a") < col("brand_b"))
      .groupBy("brand_a", "brand_b").agg(count(lit(1)).as("n_ab"))
    // brand marginals are brand-cardinality-sized — broadcast by definition
    val marg = ob.groupBy(col("brand")).agg(count(lit(1)).as("n"))
    val total = ob.select(countDistinct(col("ok")).as("n_orders"))
    pairs
      .join(broadcast(marg.select(col("brand").as("brand_a"), col("n").as("n_a"))),
        Seq("brand_a"))
      .join(broadcast(marg.select(col("brand").as("brand_b"), col("n").as("n_b"))),
        Seq("brand_b"))
      .join(broadcast(total))
      .select(col("brand_a"), col("brand_b"), col("n_ab"),
        expr("CAST(n_ab * 1000000 DIV n_orders AS BIGINT)").as("support_ppm"),
        expr("CAST(n_ab * 1000000 DIV n_a AS BIGINT)").as("confidence_ppm"),
        expr("CAST(CAST(n_ab AS DECIMAL(38,0)) * n_orders * 1000000 DIV (n_a * n_b) AS BIGINT)")
          .as("lift_ppm"))
  }

  val basketLiftSql: String =
    """WITH ob AS (
         SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
         FROM lineitem JOIN part ON l_partkey = p_partkey),
       pairs AS (
         SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_ab
         FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
         GROUP BY 1, 2),
       marg AS (SELECT brand, count(*) AS n FROM ob GROUP BY brand),
       tot AS (SELECT count(DISTINCT ok) AS n_orders FROM ob)
       SELECT brand_a, brand_b, n_ab,
              CAST(n_ab * 1000000 // n_orders AS BIGINT) AS support_ppm,
              CAST(n_ab * 1000000 // n_a AS BIGINT) AS confidence_ppm,
              CAST(CAST(n_ab AS HUGEINT) * n_orders * 1000000 // (n_a * n_b) AS BIGINT) AS lift_ppm
       FROM pairs
       JOIN (SELECT brand AS brand_a, n AS n_a FROM marg) USING (brand_a)
       JOIN (SELECT brand AS brand_b, n AS n_b FROM marg) USING (brand_b)
       CROSS JOIN tot"""

  /**
   * `time_weighted_load`: the exact daily integral of open-order
   * concurrency ([[graft.ops.Intervals.timeWeightedDaily]]) over the same
   * 7-day validity windows as `concurrency_profile` — average open orders
   * per UTC day in exact thousandths. Segments split at midnight, so the
   * oracle (one running-sum window + lead + generate_series day split)
   * replays every sub-day overlap digit-for-digit.
   */
  def timeWeightedLoad(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val us = unix_micros(col("o_orderdate").cast("timestamp"))
    val iv = t(dir, "orders").select(col("o_orderkey").as("id"),
      us.as("start_us"), (us + 7L * 86400 * 1000000).as("end_us"))
    graft.ops.Intervals.timeWeightedDaily(iv, "start_us", "end_us", "id")
  }

  val timeWeightedLoadSql: String =
    """WITH b AS (
         SELECT epoch_us(o_orderdate) AS ts, 1 AS delta, o_orderkey AS id FROM orders
         UNION ALL
         SELECT epoch_us(o_orderdate) + 604800000000, -1, o_orderkey FROM orders),
       r AS (
         SELECT ts, CAST(sum(delta) OVER (ORDER BY ts, delta, id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS active,
                row_number() OVER (ORDER BY ts, delta, id) AS rk
         FROM b),
       seg AS (
         SELECT r1.ts AS s, r2.ts AS e, r1.active
         FROM r r1 JOIN r r2 ON r2.rk = r1.rk + 1
         WHERE r2.ts > r1.ts AND r1.active > 0),
       d AS (
         SELECT s, e, active,
                unnest(generate_series(s // 86400000000, (e - 1) // 86400000000)) AS day_idx
         FROM seg)
       SELECT day_idx,
              CAST(sum(active * (least(e, (day_idx + 1) * 86400000000)
                   - greatest(s, day_idx * 86400000000))) AS BIGINT) AS active_us,
              CAST(CAST(sum(active * (least(e, (day_idx + 1) * 86400000000)
                   - greatest(s, day_idx * 86400000000))) AS HUGEINT)
                   * 1000 // 86400000000 AS BIGINT) AS avg_milli
       FROM d GROUP BY day_idx"""

  /**
   * `attribution_last`: last-touch conversion attribution
   * ([[graft.ops.Attribution.lastTouch]]) — purchases credited to the
   * latest click/view at-or-before them within a 3-day lookback, ONE
   * user-keyed exchange (running last-non-null window), unattributed
   * conversions surfaced with a null channel. The oracle replays the
   * identical window in DuckDB.
   */
  def attributionLast(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.Attribution.lastTouch(events(dir), "user_id", "event_id", "ts",
        isConversion = col("event_type") === "purchase",
        isTouch = col("event_type").isin("click", "view"),
        channel = col("event_type"),
        lookbackUs = 3L * 86400 * 1000000)
      .select(col("user_id"), col("conversion_id"),
        micros(col("conv_ts")).as("conv_ts_us"), col("channel"),
        micros(col("touch_ts")).as("touch_ts_us"))
  }

  val attributionLastSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
       w AS (SELECT *,
          last_value(CASE WHEN event_type IN ('click','view') THEN ts_us END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS UNBOUNDED PRECEDING) AS last_ts,
          last_value(CASE WHEN event_type IN ('click','view') THEN event_type END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS UNBOUNDED PRECEDING) AS last_ch
          FROM e)
       SELECT event_id AS conversion_id, user_id, ts_us AS conv_ts_us,
              CASE WHEN last_ts >= ts_us - 259200000000 THEN last_ch END AS channel,
              CASE WHEN last_ts >= ts_us - 259200000000 THEN last_ts END AS touch_ts_us
       FROM w WHERE event_type = 'purchase'"""

  /**
   * `attribution_linear`: linear multi-touch attribution
   * ([[graft.ops.Attribution.linear]]) — every click/view in the 3-day
   * window shares the purchase's credit in exact ppm, division remainder
   * to the latest touch so each conversion's credit sums to exactly 1e6.
   * Conversions join touches on the USER key only (no range join); the
   * oracle replays the pairing, the `(ts, id)` tie rule and the
   * remainder arithmetic.
   */
  def attributionLinear(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.Attribution.linear(events(dir), "user_id", "event_id", "ts",
      isConversion = col("event_type") === "purchase",
      isTouch = col("event_type").isin("click", "view"),
      channel = col("event_type"),
      lookbackUs = 3L * 86400 * 1000000)
  }

  val attributionLinearSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
       c AS (SELECT user_id, event_id AS conversion_id, ts_us AS cts FROM e
             WHERE event_type = 'purchase'),
       t AS (SELECT user_id, event_id AS tid, ts_us AS tts, event_type AS channel FROM e
             WHERE event_type IN ('click','view')),
       pairs AS (
         SELECT c.user_id, c.conversion_id, t.tid, t.tts, t.channel
         FROM c JOIN t USING (user_id)
         WHERE (t.tts < c.cts OR (t.tts = c.cts AND t.tid <= c.conversion_id))
           AND t.tts >= c.cts - 259200000000),
       ranked AS (
         SELECT *, row_number() OVER (PARTITION BY conversion_id
                                      ORDER BY tts DESC, tid DESC) AS rk,
                   count(*) OVER (PARTITION BY conversion_id) AS n
         FROM pairs)
       SELECT user_id, conversion_id, channel,
              CAST(sum(CASE WHEN rk = 1 THEN 1000000 - (n - 1) * (1000000 // n)
                            ELSE 1000000 // n END) AS BIGINT) AS credit_ppm,
              count(*) AS n_touches
       FROM ranked GROUP BY 1, 2, 3"""

  /**
   * `attribution_first`: first-touch (acquisition) attribution
   * ([[graft.ops.Attribution.firstTouch]]) — the EARLIEST in-window
   * click/view takes the purchase's credit, computed with a
   * range-bounded min-struct window (no join, one user-keyed exchange).
   * The oracle takes the rank-1 ascending pair per conversion.
   */
  def attributionFirst(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.Attribution.firstTouch(events(dir), "user_id", "event_id", "ts",
        isConversion = col("event_type") === "purchase",
        isTouch = col("event_type").isin("click", "view"),
        channel = col("event_type"),
        lookbackUs = 3L * 86400 * 1000000)
      .withColumnRenamed("conv_ts", "conv_ts_us")
      .withColumnRenamed("touch_ts", "touch_ts_us")
  }

  val attributionFirstSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
       c AS (SELECT user_id, event_id AS conversion_id, ts_us AS cts FROM e
             WHERE event_type = 'purchase'),
       t AS (SELECT user_id, event_id AS tid, ts_us AS tts, event_type AS channel FROM e
             WHERE event_type IN ('click','view')),
       pairs AS (
         SELECT c.conversion_id, t.tid, t.tts, t.channel
         FROM c JOIN t USING (user_id)
         WHERE (t.tts < c.cts OR (t.tts = c.cts AND t.tid <= c.conversion_id))
           AND t.tts >= c.cts - 259200000000),
       firsts AS (
         SELECT * FROM (
           SELECT *, row_number() OVER (PARTITION BY conversion_id
                                        ORDER BY tts ASC, tid ASC) AS rk
           FROM pairs) WHERE rk = 1)
       SELECT c.user_id, c.conversion_id, c.cts AS conv_ts_us,
              f.channel, f.tts AS touch_ts_us
       FROM c LEFT JOIN firsts f USING (conversion_id)"""

  /**
   * `attribution_position`: U-shaped (40/40/20) multi-touch attribution
   * ([[graft.ops.Attribution.positionBased]]) — first and last in-window
   * touch take 400,000 ppm each, middles share 200,000 with the
   * remainder on the last touch; 1-touch takes all, 2-touch splits
   * 500k/500k. Credit conserves to exactly 1e6 per conversion on both
   * engines.
   */
  def attributionPosition(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.Attribution.positionBased(events(dir), "user_id", "event_id", "ts",
      isConversion = col("event_type") === "purchase",
      isTouch = col("event_type").isin("click", "view"),
      channel = col("event_type"),
      lookbackUs = 3L * 86400 * 1000000, edgePct = 40)
  }

  val attributionPositionSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
       c AS (SELECT user_id, event_id AS conversion_id, ts_us AS cts FROM e
             WHERE event_type = 'purchase'),
       t AS (SELECT user_id, event_id AS tid, ts_us AS tts, event_type AS channel FROM e
             WHERE event_type IN ('click','view')),
       pairs AS (
         SELECT c.user_id, c.conversion_id, t.tid, t.tts, t.channel
         FROM c JOIN t USING (user_id)
         WHERE (t.tts < c.cts OR (t.tts = c.cts AND t.tid <= c.conversion_id))
           AND t.tts >= c.cts - 259200000000),
       ranked AS (
         SELECT *, row_number() OVER (PARTITION BY conversion_id
                                      ORDER BY tts DESC, tid DESC) AS rk,
                   count(*) OVER (PARTITION BY conversion_id) AS n
         FROM pairs)
       SELECT user_id, conversion_id, channel,
              CAST(sum(CASE WHEN n = 1 THEN 1000000
                            WHEN n = 2 THEN 500000
                            WHEN rk = n THEN 400000
                            WHEN rk = 1 THEN 600000 - (n - 2) * (200000 // (n - 2))
                            ELSE 200000 // (n - 2) END) AS BIGINT) AS credit_ppm,
              count(*) AS n_touches
       FROM ranked GROUP BY 1, 2, 3"""

  /**
   * `dq_checks`: a [[graft.ops.DataQuality.check]] constraint suite over
   * orders — null gates, a price range, an accepted-status set, a priority
   * shape regex, key/attribute uniqueness and referential integrity
   * against customer. All row-level gates fold into ONE aggregate over a
   * single scan; the two uniqueness gates are count-per-key shuffles; the
   * FK is a broadcast anti-join. Mixed pass/fail by construction (P-status
   * rows and >400k prices exist; o_custkey is deliberately non-unique).
   */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import graft.ops.DataQuality._
    check(t(dir, "orders"), Seq(
      NotNull("o_custkey"),
      NotNull("o_orderdate"),
      inRange("o_totalprice", 0, 400000),
      Accepted("o_orderstatus", Seq("F", "O")),
      Satisfies("priority_shape", col("o_orderpriority").rlike("^[1-5]-")),
      Unique(Seq("o_orderkey")),
      Unique(Seq("o_custkey")),
      ForeignKey("o_custkey", t(dir, "customer"), "c_custkey")))
  }

  val dqChecksSql: String =
    """WITH v AS (
         SELECT 'not_null(o_custkey)' AS constraint,
                count(*) FILTER (WHERE o_custkey IS NULL) AS violations FROM orders
         UNION ALL
         SELECT 'not_null(o_orderdate)',
                count(*) FILTER (WHERE o_orderdate IS NULL) FROM orders
         UNION ALL
         SELECT 'in_range(o_totalprice)',
                count(*) FILTER (WHERE o_totalprice IS NULL
                  OR NOT (o_totalprice BETWEEN 0 AND 400000)) FROM orders
         UNION ALL
         SELECT 'accepted(o_orderstatus)',
                count(*) FILTER (WHERE o_orderstatus IS NULL
                  OR o_orderstatus NOT IN ('F', 'O')) FROM orders
         UNION ALL
         SELECT 'priority_shape',
                count(*) FILTER (WHERE o_orderpriority IS NULL
                  OR NOT regexp_matches(o_orderpriority, '^[1-5]-')) FROM orders
         UNION ALL
         SELECT 'unique(o_orderkey)', coalesce(sum(n - 1), 0) FROM (
           SELECT count(*) AS n FROM orders GROUP BY o_orderkey) g WHERE n > 1
         UNION ALL
         SELECT 'unique(o_custkey)', coalesce(sum(n - 1), 0) FROM (
           SELECT count(*) AS n FROM orders GROUP BY o_custkey) g WHERE n > 1
         UNION ALL
         SELECT 'foreign_key(o_custkey)', count(*) FROM orders o
         WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
           SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
       SELECT "constraint", cast(violations AS bigint) AS violations,
              CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
       FROM v"""

  /**
   * `dq_profile`: [[graft.ops.DataQuality.profile]] over four event
   * columns — rows / non-null / EXACT distinct / completeness ppm per
   * column, computed in one aggregate (Catalyst expands the multi-distinct
   * into one Expand + two-phase agg with map-side dedup).
   */
  def dqProfile(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.DataQuality.profile(
      events(dir), Seq("user_id", "event_type", "value", "props"))
  }

  val dqProfileSql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS column, count(*) AS rows, count($c) AS non_null,
            count(DISTINCT $c) AS n_distinct,
            count($c) * 1000000 // count(*) AS completeness_ppm
          FROM events"""
    Seq("user_id", "event_type", "value", "props").map(one)
      .mkString("\nUNION ALL\n")
  }

  /**
   * Daily ingest volume anomalies: a `(event_type, day)` bucket is flagged
   * when its count exceeds 115% of its trailing 7-observed-day average —
   * exact integer cross-multiply, no float division
   * ([[graft.ops.Drift.volumeAnomalies]]).
   */
  def ingestAnomalies(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.Drift.volumeAnomalies(
      events(dir), "event_type", date_format(col("ts"), "yyyy-MM-dd"),
      trailing = 7, factorPct = 115, minPrevDays = 3)
  }

  val ingestAnomaliesSql: String =
    """WITH daily AS (
         SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
         FROM events GROUP BY 1, 2),
       w AS (
         SELECT event_type, day, n,
                CAST(coalesce(sum(n) OVER (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev_n,
                count(n) OVER (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS prev_days
         FROM daily)
       SELECT event_type, day, n, prev_n, prev_days
       FROM w WHERE prev_days >= 3 AND n * prev_days * 100 > prev_n * 115"""

  /**
   * Key-skew profile of the event stream's user key: top 10 hottest users
   * by exact count with integer-ppm share ([[graft.ops.Skew.skewProfile]]) —
   * the measurement that sizes a salting factor before a user-keyed shuffle.
   */
  def keySkewProfile(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.Skew.skewProfile(events(dir), "user_id", k = 10)
  }

  val keySkewProfileSql: String =
    """WITH counts AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
       tot AS (SELECT sum(n) AS t FROM counts)
       SELECT user_id, n,
              cast(cast(n AS hugeint) * 1000000 // t AS bigint) AS share_ppm
       FROM counts, tot
       ORDER BY n DESC, user_id LIMIT 10"""

  /**
   * First-order event-type transition matrix over per-user sequences
   * ([[graft.ops.Funnels.transitionCounts]]): exact pair counts + integer
   * ppm share, (ts, event_id) total order so engines pair identically.
   */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.Funnels.transitionCounts(events(dir), "user_id", "ts", "event_type", "event_id")
  }

  val eventTransitionsSql: String =
    """WITH seq AS (
         SELECT event_type AS from_type,
                lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
         FROM events),
       pairs AS (
         SELECT from_type, to_type, count(*) AS n FROM seq
         WHERE to_type IS NOT NULL GROUP BY 1, 2),
       tot AS (SELECT sum(n) AS t FROM pairs)
       SELECT from_type, to_type, n,
              cast(cast(n AS hugeint) * 1000000 // t AS bigint) AS share_ppm
       FROM pairs, tot"""

  /**
   * Weekly retention cohorts over the event stream
   * ([[graft.ops.Funnels.retentionCohorts]]): users keyed to their first
   * ISO week, counted once per week they return.
   */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.Funnels.retentionCohorts(events(dir), "user_id",
      date_format(date_trunc("week", col("ts")), "yyyy-MM-dd"))
  }

  val retentionCohortsSql: String =
    """WITH bucketed AS (
         SELECT DISTINCT user_id, strftime(date_trunc('week', ts), '%Y-%m-%d') AS bucket
         FROM events),
       cohorts AS (SELECT user_id, min(bucket) AS cohort FROM bucketed GROUP BY user_id)
       SELECT cohort, bucket, count(*) AS n_users
       FROM bucketed JOIN cohorts USING (user_id)
       GROUP BY 1, 2"""

  /**
   * Deterministic synthetic HTML page per document for the link-graph
   * queries (the word-soup corpus has no HTML): three outlinks to hosts
   * `h<(7*doc_id + 13*i) % 250>.example` plus two anchors the extractor
   * must SKIP by design — one whose text contains nested markup
   * (`read <b>more</b>`, excluded by the `[^<]*` text class) and one with
   * a single-quoted href. Shared by `extract_links` and `host_pagerank`;
   * the oracles rebuild the identical page in DuckDB.
   */
  private def linkPageHtml: Column = {
    val id = col("doc_id")
    def host(i: Int): Column =
      concat(lit("h"), ((id * 7 + lit(i * 13)) % 250).cast("string"), lit(".example"))
    concat(
      lit("<html><body><div class=\"nav\"><a href=\"https://"), host(0),
      lit("/p/"), id.cast("string"), lit("?x=1\">home</a></div><p>"),
      substring(col("text"), 1, 40),
      lit(" <a id=\"l1\" href=\"https://"), host(1),
      lit("/q\">read <b>more</b></a></p>"),
      lit("<a href='https://skip.example/s'>skipme</a>"),
      lit("<a href=\"https://"), host(2), lit("/r\">next page</a></body></html>"))
  }

  private val sqlLinkPages: String =
    """pages AS (
         SELECT doc_id,
           '<html><body><div class="nav"><a href="https://h' || ((doc_id * 7) % 250) ||
           '.example/p/' || doc_id || '?x=1">home</a></div><p>' ||
           substring(text, 1, 40) ||
           ' <a id="l1" href="https://h' || ((doc_id * 7 + 13) % 250) ||
           '.example/q">read <b>more</b></a></p>' ||
           '<a href=''https://skip.example/s''>skipme</a>' ||
           '<a href="https://h' || ((doc_id * 7 + 26) % 250) ||
           '.example/r">next page</a></body></html>' AS html
         FROM documents)"""

  private val sqlAnchorPat = """(?i)<a\s[^>]*href="([^"]+)"[^>]*>([^<]*)</a>"""

  /**
   * `extract_links`: [[Web.extractLinks]] over the synthetic pages — one
   * row per anchor element with aligned href/anchor text. The two
   * skip-by-design anchors (nested markup, single-quoted href) must NOT
   * appear, so positions are 0 (nav "home") and 1 ("next page") on every
   * page; the oracle replays the identical RE2 pattern and a positional
   * unnest zip in DuckDB.
   */
  def extractLinksQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val pages = t(dir, "documents").select(col("doc_id"), linkPageHtml.as("html"))
    Web.extractLinks(pages, "doc_id", "html")
  }

  val extractLinksSql: String =
    s"""WITH $sqlLinkPages,
       ex AS (
         SELECT doc_id,
           regexp_extract_all(html, '$sqlAnchorPat', 1) AS hrefs,
           regexp_extract_all(html, '$sqlAnchorPat', 2) AS anchors
         FROM pages)
       SELECT doc_id, CAST(unnest(range(1, len(hrefs) + 1)) - 1 AS BIGINT) AS link_pos,
              unnest(hrefs) AS href, unnest(anchors) AS anchor
       FROM ex"""

  /**
   * `host_pagerank`: the full link-graph chain — synthetic pages →
   * [[Web.extractLinks]] → [[Web.urlHost]] → distinct host edges (page's
   * own host `h<doc_id % 250>.example` → each outlink host) →
   * [[graft.ops.Graphs.pageRank]], 5 exact fixed-point iterations at
   * damping 85. The oracle rebuilds the pages, replays the extraction and
   * host parse, and unrolls the 5 iterations as CTEs in the identical
   * integer arithmetic (`//` truncation = Spark `DIV`), so every rank
   * digit hash-matches.
   */
  /** The synthetic host edge frame shared by the link-graph queries. */
  private def linkHostEdges(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val pages = t(dir, "documents").select(col("doc_id"), linkPageHtml.as("html"))
    val links = Web.extractLinks(pages, "doc_id", "html")
    links.select(
      concat(lit("h"), (col("doc_id") % 250).cast("string"), lit(".example")).as("src"),
      Web.urlHost(col("href")).as("dst"))
  }

  /** DuckDB twin of [[linkHostEdges]]: CTE chain ending in `edges(src, dst)`. */
  private val sqlHostEdgesCtes: String =
    s"""$sqlLinkPages,
       ex AS (SELECT doc_id, regexp_extract_all(html, '$sqlAnchorPat', 1) AS hrefs FROM pages),
       links AS (SELECT doc_id, unnest(hrefs) AS href FROM ex),
       rawe AS (
         SELECT 'h' || (doc_id % 250) || '.example' AS src,
           lower(regexp_replace(regexp_extract(regexp_replace(href, '#.*', '', 'g'),
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), ':[0-9]+$$', '', 'g')) AS dst
         FROM links),
       edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM rawe
                 WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst)"""

  def hostPagerank(spark: SparkSession, dir: String): DataFrame = {
    graft.ops.Graphs.pageRank(linkHostEdges(spark, dir), iterations = 5)
      .select(col("id").as("host"), col("rank").as("rank_fp"))
  }

  val hostPagerankSql: String = {
    val n = "(SELECT count(*) FROM nodes)"
    val teleport = s"(((100 - 85) * (1000000000000 // $n)) // 100)"
    val rounds = (1 to 5).map { k =>
      s"""r$k AS (
           SELECT nd.id,
             CAST($teleport + (85 * coalesce(c.inbound, 0)) // 100 AS BIGINT) AS rank
           FROM nodes nd LEFT JOIN (
             SELECT e.dst AS id, CAST(sum(s.rank // d.deg) AS BIGINT) AS inbound
             FROM edges e JOIN r${k - 1} s ON e.src = s.id JOIN deg d ON e.src = d.id
             GROUP BY e.dst) c ON nd.id = c.id)"""
    }.mkString(",\n       ")
    s"""WITH $sqlHostEdgesCtes,
       nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
       deg AS (SELECT src AS id, count(*) AS deg FROM edges GROUP BY src),
       r0 AS (SELECT id, CAST(1000000000000 // $n AS BIGINT) AS rank FROM nodes),
       $rounds
       SELECT id AS host, rank AS rank_fp FROM r5"""
  }

  /**
   * `host_triangles`: exact triangle counts + local clustering coefficient
   * over the undirected host graph ([[graft.ops.Graphs.triangleCounts]] —
   * degree-ordered O(m^1.5) counting, every node's wedge fan-out bounded
   * by sqrt(m) regardless of hub skew). The oracle is the NAIVE
   * definition — three-way canonical edge self-join `(a<b<c)` + corner
   * unnest — so the hash match proves the orientation trick is lossless,
   * not just self-consistent.
   */
  def hostTriangles(spark: SparkSession, dir: String): DataFrame = {
    graft.ops.Graphs.triangleCounts(linkHostEdges(spark, dir))
      .select(col("id").as("host"), col("degree"), col("triangles"), col("lcc_ppm"))
  }

  val hostTrianglesSql: String =
    s"""WITH $sqlHostEdgesCtes,
       und AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi FROM edges),
       deg AS (SELECT id, count(*) AS degree
               FROM (SELECT lo AS id FROM und UNION ALL SELECT hi FROM und) GROUP BY id),
       tri AS (SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
               FROM und ab JOIN und bc ON ab.hi = bc.lo
               JOIN und ac ON ac.lo = ab.lo AND ac.hi = bc.hi),
       pern AS (SELECT id, count(*) AS triangles
                FROM (SELECT unnest([a, b, c]) AS id FROM tri) GROUP BY id)
       SELECT d.id AS host, d.degree,
              CAST(coalesce(p.triangles, 0) AS BIGINT) AS triangles,
              CAST(CASE WHEN d.degree < 2 THEN 0
                   ELSE 2 * coalesce(p.triangles, 0) * 1000000
                        // (d.degree * (d.degree - 1)) END AS BIGINT) AS lcc_ppm
       FROM deg d LEFT JOIN pern p ON d.id = p.id"""

  /**
   * `benford_profile`: first-significant-digit distribution of order
   * totals in exact cents ([[graft.ops.DataQuality.benfordProfile]]) —
   * the Benford fabrication screen as a DQ pass. Digits come from the
   * canonical integer rendering (never float formatting), shares in
   * exact ppm against the POSITIVE-row total only (the '-' junk bucket
   * keeps its count but a NULL share, so digit shares compare directly
   * against the Benford expectation table).
   */
  def benfordPrices(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.DataQuality.benfordProfile(
      t(dir, "orders").select(cents(col("o_totalprice")).as("v")), "v")
  }

  val benfordPricesSql: String =
    s"""WITH d AS (
         SELECT CASE WHEN c IS NOT NULL AND c > 0
                THEN substring(CAST(c AS VARCHAR), 1, 1) ELSE '-' END AS digit
         FROM (SELECT ${sqlCents("o_totalprice")} AS c FROM orders)),
       g AS (SELECT digit, count(*) AS n FROM d GROUP BY digit)
       SELECT digit, n,
              CAST(CASE WHEN digit = '-' THEN NULL
                   ELSE n * 1000000 // (SELECT sum(n) FROM g WHERE digit <> '-')
                   END AS BIGINT) AS share_ppm
       FROM g"""

  /**
   * `cumulative_users`: exact cumulative distinct users per day — the
   * audience-growth curve. "Distinct so far" is normally the scale
   * killer (state ∝ id universe per cut-off); first-touch decomposition
   * makes it exact AND distributed: a user counts on exactly the day of
   * their first event, so cumulative distinct = running total of daily
   * first-touches — one user-keyed min agg, one day-sized count, and the
   * no-one-reducer running sum ([[graft.ops.Intervals.withRunningTotal]]).
   * The oracle is the plain one-window definition.
   */
  def cumulativeUsers(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val firstDay = events(dir)
      .groupBy(col("user_id"))
      .agg(min(date_format(col("ts"), "yyyy-MM-dd")).as("day"))
    val perDay = firstDay.groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    graft.ops.Intervals.withRunningTotal(perDay, "cum_users", "new_users", col("day"))
  }

  val cumulativeUsersSql: String =
    """WITH fd AS (SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS day FROM events GROUP BY user_id),
       pd AS (SELECT day, count(*) AS new_users FROM fd GROUP BY day)
       SELECT day, new_users,
              cast(sum(new_users) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS cum_users
       FROM pd"""

  /**
   * `ab_test`: per-event-type 2x2 experiment readout
   * ([[graft.ops.Stats.chiSquare2x2]]) — exposure = even user id (the
   * deterministic stand-in for a variant assignment), outcome =
   * value > 50. One conditional-count aggregation + exact staged-integer
   * chi-squared and lift arithmetic; the oracle replays the cells and
   * every truncated division in HUGEINT.
   */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir)
      .withColumn("exposure", col("user_id") % 2 === 0)
      .withColumn("outcome", col("value") > 50)
    graft.ops.Stats.chiSquare2x2(ev, Seq("event_type"), "exposure", "outcome")
  }

  val abTestSql: String =
    """WITH cells AS (
         SELECT event_type,
           CAST(sum(CASE WHEN user_id % 2 = 0 AND value > 50 THEN 1 ELSE 0 END) AS HUGEINT) AS a,
           CAST(sum(CASE WHEN user_id % 2 = 0 AND NOT (value > 50) THEN 1 ELSE 0 END) AS HUGEINT) AS b,
           CAST(sum(CASE WHEN NOT (user_id % 2 = 0) AND value > 50 THEN 1 ELSE 0 END) AS HUGEINT) AS c,
           CAST(sum(CASE WHEN NOT (user_id % 2 = 0) AND NOT (value > 50) THEN 1 ELSE 0 END) AS HUGEINT) AS d
         FROM events GROUP BY event_type)
       SELECT event_type,
         CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
         CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
         CAST(CASE WHEN a + b = 0 OR c + d = 0 THEN NULL
              ELSE a * 1000000 // (a + b) - c * 1000000 // (c + d)
              END AS BIGINT) AS lift_ppm,
         CAST(CASE WHEN a + b = 0 OR c + d = 0 OR a + c = 0 OR b + d = 0 THEN NULL
              ELSE ((a * d - b * c) * (a * d - b * c) * 1000 // ((a + b) * (c + d)))
                   * (a + b + c + d) * 1000 // ((a + c) * (b + d))
              END AS BIGINT) AS chi2_micro
       FROM cells"""

  /**
   * `host_kcore`: fixed-round 4-core peeling of the host graph
   * ([[graft.ops.Graphs.kCore]], 4 rounds) — at sf0.01 the cascade is
   * caught MID-PEEL (~82 of 250 hosts survive round 4; round 6 would
   * empty it), so the oracle exercises both the alive-set filters and
   * the bounded-round law, not a fixed point; every peel round unrolls
   * as CTEs so the surviving set and every in-core degree replay
   * exactly.
   */
  def hostKcore(spark: SparkSession, dir: String): DataFrame = {
    graft.ops.Graphs.kCore(linkHostEdges(spark, dir), k = 4, rounds = 4)
      .select(col("id").as("host"), col("degree"))
  }

  val hostKcoreSql: String = {
    val rounds = (2 to 4).map { r =>
      s"""e$r AS (SELECT lo, hi FROM und
            WHERE lo IN (SELECT id FROM a${r - 1}) AND hi IN (SELECT id FROM a${r - 1})),
         d$r AS (SELECT id, count(*) AS degree
                 FROM (SELECT lo AS id FROM e$r UNION ALL SELECT hi FROM e$r) GROUP BY id),
         a$r AS (SELECT id FROM d$r WHERE degree >= 4)"""
    }.mkString(",\n       ")
    s"""WITH $sqlHostEdgesCtes,
       und AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi FROM edges),
       d1 AS (SELECT id, count(*) AS degree
              FROM (SELECT lo AS id FROM und UNION ALL SELECT hi FROM und) GROUP BY id),
       a1 AS (SELECT id FROM d1 WHERE degree >= 4),
       $rounds,
       ef AS (SELECT lo, hi FROM und
              WHERE lo IN (SELECT id FROM a4) AND hi IN (SELECT id FROM a4)),
       df AS (SELECT id, count(*) AS degree
              FROM (SELECT lo AS id FROM ef UNION ALL SELECT hi FROM ef) GROUP BY id)
       SELECT id AS host, degree FROM df WHERE id IN (SELECT id FROM a4)"""
  }

  /**
   * `host_reach`: exact BFS hop distances within 4 hops of the seed host
   * `h0.example` over the directed host graph
   * ([[graft.ops.Graphs.bfsDistances]]) — reach analysis; the oracle
   * unrolls the four frontier-min rounds.
   */
  def hostReach(spark: SparkSession, dir: String): DataFrame = {
    graft.ops.Graphs.bfsDistances(linkHostEdges(spark, dir), Seq("h0.example"), maxDepth = 4)
      .select(col("id").as("host"), col("dist"))
  }

  val hostReachSql: String = {
    val rounds = (1 to 4).map { r =>
      s"""r$r AS (
           SELECT id, min(dist) AS dist FROM (
             SELECT id, dist FROM r${r - 1}
             UNION ALL
             SELECT e.dst AS id, rr.dist + 1 AS dist
             FROM edges e JOIN r${r - 1} rr ON e.src = rr.id) GROUP BY id)"""
    }.mkString(",\n       ")
    s"""WITH $sqlHostEdgesCtes,
       r0 AS (SELECT 'h0.example' AS id, 0 AS dist),
       $rounds
       SELECT id AS host, CAST(dist AS BIGINT) AS dist FROM r4"""
  }

  /**
   * `host_communities`: synchronous label-propagation communities over
   * the host graph ([[graft.ops.Graphs.labelPropagation]], 4 fixed
   * rounds, smallest-label ties) — the oracle unrolls all four rounds as
   * CTEs with the identical `(cnt DESC, label)` argmax, so every final
   * label is replayed exactly, the same unrolled-fixed-point pattern as
   * `host_pagerank`/`host_hits`.
   */
  def hostCommunities(spark: SparkSession, dir: String): DataFrame = {
    graft.ops.Graphs.labelPropagation(linkHostEdges(spark, dir), iterations = 4)
      .select(col("id").as("host"), col("community"))
  }

  val hostCommunitiesSql: String = {
    val rounds = (1 to 4).map { k =>
      s"""c$k AS (
           SELECT e.u AS id, r.lbl AS lbl, count(*) AS cnt
           FROM bidir e JOIN r${k - 1} r ON e.v = r.id GROUP BY 1, 2),
         r$k AS (
           SELECT id, lbl FROM (
             SELECT id, lbl,
                    row_number() OVER (PARTITION BY id ORDER BY cnt DESC, lbl) AS rn
             FROM c$k) WHERE rn = 1)"""
    }.mkString(",\n       ")
    s"""WITH $sqlHostEdgesCtes,
       bidir AS (SELECT src AS u, dst AS v FROM edges UNION SELECT dst, src FROM edges),
       r0 AS (SELECT DISTINCT u AS id, u AS lbl FROM bidir),
       $rounds
       SELECT id AS host, lbl AS community FROM r4"""
  }

  /**
   * `ols_trend`: per-nation revenue trend — exact-ppm least-squares fit
   * ([[graft.ops.Stats.olsFit]]) of daily revenue cents against the day
   * index. ONE sufficient-statistics aggregation (six DECIMAL(38,0) sums,
   * map-side combined) + closed-form integer arithmetic; r² composes the
   * two already-truncated slopes so no covariance is ever squared
   * (mathematically bounded by 1e12, so the product can't overflow). The
   * oracle replays every sum and every truncated division in HUGEINT —
   * both engines truncate integer division toward zero, so negative
   * slopes match digit-for-digit too.
   */
  def olsTrend(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val daily = t(dir, "orders")
      .join(t(dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
          .as("day_x"))
      .agg(sum(cents(col("o_totalprice"))).as("rev_cents"))
    graft.ops.Stats.olsFit(daily, Seq("n_name"), "day_x", "rev_cents")
  }

  val olsTrendSql: String =
    s"""WITH daily AS (
         SELECT n_name,
                datediff('day', DATE '1992-01-01', cast(o_orderdate as date)) AS day_x,
                sum(${sqlCents("o_totalprice")}) AS rev_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1, 2),
       s AS (
         SELECT n_name, CAST(count(*) AS HUGEINT) AS n,
                CAST(sum(CAST(day_x AS HUGEINT)) AS HUGEINT) AS sx,
                CAST(sum(CAST(rev_cents AS HUGEINT)) AS HUGEINT) AS sy,
                CAST(sum(CAST(day_x AS HUGEINT) * rev_cents) AS HUGEINT) AS sxy,
                CAST(sum(CAST(day_x AS HUGEINT) * day_x) AS HUGEINT) AS sxx,
                CAST(sum(CAST(rev_cents AS HUGEINT) * rev_cents) AS HUGEINT) AS syy
         FROM daily GROUP BY n_name),
       d AS (
         SELECT n_name, n, sx, sy,
                n * sxx - sx * sx AS dxx,
                n * sxy - sx * sy AS dxy,
                n * syy - sy * sy AS dyy
         FROM s)
       SELECT n_name, CAST(n AS BIGINT) AS n,
         CAST(CASE WHEN dxx = 0 THEN NULL
              ELSE dxy * 1000000 // dxx END AS BIGINT) AS slope_ppm,
         CAST(CASE WHEN dxx = 0 THEN NULL
              ELSE (sy * 1000000 - (dxy * 1000000 // dxx) * sx) // n
              END AS BIGINT) AS intercept_ppm,
         CAST(CASE WHEN dxx = 0 OR dyy = 0 THEN NULL
              ELSE (dxy * 1000000 // dxx) * (dxy * 1000000000 // dyy) // 1000000000
              END AS BIGINT) AS r2_ppm
       FROM d"""

  /**
   * `host_hits`: [[graft.ops.Graphs.hits]] over the same host edges — 5
   * exact fixed-point iterations, each round's authority and hub vectors
   * max-normalized to 1e6 via a scalar-max join. The oracle unrolls all
   * ten agg/normalize steps as CTEs with scalar subqueries in identical
   * integer arithmetic.
   */
  def hostHits(spark: SparkSession, dir: String): DataFrame = {
    graft.ops.Graphs.hits(linkHostEdges(spark, dir), iterations = 5)
      .select(col("id").as("host"), col("hub"), col("authority"))
  }

  val hostHitsSql: String = {
    // AS MATERIALIZED throughout: every frame here is referenced more than
    // once (the scalar max + the next step), and an INLINED 10-step unroll
    // re-evaluates the whole chain per reference — exponential in rounds
    def norm(from: String, to: String): String =
      s"""$to AS MATERIALIZED (SELECT id, CAST(CAST(v AS HUGEINT) * 1000000 //
            greatest((SELECT max(v) FROM $from), 1) AS BIGINT) AS v FROM $from)"""
    val rounds = (1 to 5).map { r =>
      s"""a${r}f AS MATERIALIZED (
           SELECT n.id, coalesce(x.v, 0) AS v FROM nodes n LEFT JOIN (
             SELECT e.dst AS id, CAST(sum(h.v) AS BIGINT) AS v
             FROM edges e JOIN h${r - 1} h ON e.src = h.id GROUP BY e.dst) x
           ON n.id = x.id),
         ${norm(s"a${r}f", s"a$r")},
         h${r}f AS MATERIALIZED (
           SELECT n.id, coalesce(x.v, 0) AS v FROM nodes n LEFT JOIN (
             SELECT e.src AS id, CAST(sum(a.v) AS BIGINT) AS v
             FROM edges e JOIN a$r a ON e.dst = a.id GROUP BY e.src) x
           ON n.id = x.id),
         ${norm(s"h${r}f", s"h$r")}"""
    }.mkString(",\n       ")
    s"""WITH $sqlHostEdgesCtes,
       nodes AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
       h0 AS MATERIALIZED (SELECT id, CAST(1000000 AS BIGINT) AS v FROM nodes),
       $rounds
       SELECT h5.id AS host, h5.v AS hub, a5.v AS authority
       FROM h5 JOIN a5 ON h5.id = a5.id"""
  }

  /**
   * `host_degrees`: [[graft.ops.Graphs.degreeStats]] — out/in degree and
   * reciprocated-edge counts per host over the same edge frame.
   */
  def hostDegrees(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Graphs.degreeStats(linkHostEdges(spark, dir))
      .select(col("id").as("host"), col("out_deg"), col("in_deg"), col("reciprocal"))

  val hostDegreesSql: String =
    s"""WITH $sqlHostEdgesCtes,
       outd AS (SELECT src AS id, count(*) AS out_deg FROM edges GROUP BY src),
       ind AS (SELECT dst AS id, count(*) AS in_deg FROM edges GROUP BY dst),
       recip AS (
         SELECT e.src AS id, count(*) AS reciprocal
         FROM edges e JOIN edges r ON e.src = r.dst AND e.dst = r.src
         GROUP BY e.src),
       ids AS (SELECT id FROM outd UNION SELECT id FROM ind)
       SELECT i.id AS host,
              coalesce(o.out_deg, 0) AS out_deg,
              coalesce(n.in_deg, 0) AS in_deg,
              coalesce(r.reciprocal, 0) AS reciprocal
       FROM ids i LEFT JOIN outd o ON i.id = o.id
       LEFT JOIN ind n ON i.id = n.id
       LEFT JOIN recip r ON i.id = r.id"""

  /**
   * `fuzzy_join`: [[graft.ops.Joins.editDistanceJoin]] — the exact
   * Levenshtein-threshold self-join over deterministic variant strings
   * (customer keys grouped in families of 4: a 10-hex-char md5 base, with
   * variants 1-3 substituting `z` at positions 3/6/9, so intra-family
   * distances are exactly 1 or 2 and every family yields its 6 pairs at
   * `maxDist = 2`). The Spark side runs the segment-blocked PassJoin-style
   * plan; the oracle is the NAIVE all-pairs `levenshtein(a, b) <= 2`
   * definition in DuckDB — the hash-match IS the blocked-equals-naive
   * exactness proof.
   */
  def fuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val base = substring(md5(concat(lit("fz:"), expr("c_custkey DIV 4").cast("string"))), 1, 10)
    val str = expr(
      """CASE WHEN c_custkey % 4 = 0 THEN __base
         ELSE concat(substring(__base, 1, CAST((c_custkey % 4) * 3 - 1 AS INT)), 'z',
           substring(__base, CAST((c_custkey % 4) * 3 + 1 AS INT),
             CAST(10 - (c_custkey % 4) * 3 AS INT))) END""")
    val strs = t(dir, "customer").withColumn("__base", base)
      .select(col("c_custkey").as("id"), str.as("str"))
    graft.ops.Joins.editDistanceJoin(strs, "id", "str", strs, "id", "str", maxDist = 2)
      .where(col("id_a") < col("id_b"))
  }

  val fuzzyJoinSql: String =
    """WITH s AS (
         SELECT c_custkey AS id,
           CASE WHEN c_custkey % 4 = 0 THEN base
                ELSE substring(base, 1, (c_custkey % 4) * 3 - 1) || 'z' ||
                     substring(base, (c_custkey % 4) * 3 + 1, 10 - (c_custkey % 4) * 3) END AS str
         FROM (SELECT c_custkey,
                 substring(md5('fz:' || (c_custkey // 4)), 1, 10) AS base
               FROM customer))
       SELECT a.id AS id_a, b.id AS id_b,
              CAST(levenshtein(a.str, b.str) AS BIGINT) AS dist
       FROM s a JOIN s b ON a.id < b.id
       WHERE levenshtein(a.str, b.str) <= 2"""

  /**
   * `sorted_neighborhood`: the Hernandez-Stolfo sorted-neighborhood
   * method over the same perturbed-string corpus as `fuzzy_join` —
   * global sort order (no-one-reducer rank), pair rows within 10
   * positions, verify with Levenshtein <= 2
   * ([[graft.ops.Dedup.sortedNeighborhoodPairs]]). Same verifier as
   * PassJoin but different blocking, so the two queries expose the
   * recall trade directly; the oracle replays rank, window pairing and
   * distances.
   */
  def sortedNeighborhood(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val base = substring(md5(concat(lit("fz:"), expr("c_custkey DIV 4").cast("string"))), 1, 10)
    val str = expr(
      """CASE WHEN c_custkey % 4 = 0 THEN __base
         ELSE concat(substring(__base, 1, CAST((c_custkey % 4) * 3 - 1 AS INT)), 'z',
           substring(__base, CAST((c_custkey % 4) * 3 + 1 AS INT),
             CAST(10 - (c_custkey % 4) * 3 AS INT))) END""")
    val strs = t(dir, "customer").withColumn("__base", base)
      .select(col("c_custkey").as("id"), str.as("str"))
    graft.ops.Dedup.sortedNeighborhoodPairs(strs, "id", "str", window = 10)
      .withColumn("dist", levenshtein(col("value_a"), col("value_b")).cast("long"))
      .where(col("dist") <= 2)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  val sortedNeighborhoodSql: String =
    """WITH s AS (
         SELECT c_custkey AS id,
           CASE WHEN c_custkey % 4 = 0 THEN base
                ELSE substring(base, 1, (c_custkey % 4) * 3 - 1) || 'z' ||
                     substring(base, (c_custkey % 4) * 3 + 1, 10 - (c_custkey % 4) * 3) END AS str
         FROM (SELECT c_custkey,
                 substring(md5('fz:' || (c_custkey // 4)), 1, 10) AS base
               FROM customer)),
       r AS (SELECT id, str, row_number() OVER (ORDER BY str, id) AS rank FROM s)
       SELECT a.id AS id_a, b.id AS id_b,
              CAST(levenshtein(a.str, b.str) AS BIGINT) AS dist
       FROM r a JOIN r b ON b.rank > a.rank AND b.rank - a.rank < 10
       WHERE levenshtein(a.str, b.str) <= 2"""

  /**
   * `damerau_pairs`: typo-metric fuzzy scoring — part-name pairs blocked
   * on the shared last word, scored with the
   * [[graft.functions.StringDistanceOps unrestricted Damerau-Levenshtein]]
   * kernel (transposition costs 1 where Levenshtein charges 2). Blocking
   * is an equi-join (never all-pairs); only block-mates pay the DP. The
   * names are ASCII, where the kernel's code-point semantics and DuckDB's
   * byte-based `damerau_levenshtein` coincide — the oracle replays the
   * block join and every distance digit.
   */
  def damerauPairs(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val parts = t(dir, "part").select(col("p_partkey").as("id"),
      col("p_name").as("name"),
      element_at(split(col("p_name"), " "), -1).as("block"))
    val a = parts.where(col("id") % 7 === 1)
      .select(col("block"), col("id").as("id_a"), col("name").as("__na"))
    val b = parts.where(col("id") % 7 === 2)
      .select(col("block"), col("id").as("id_b"), col("name").as("__nb"))
    a.join(b, "block")
      .withColumn("dist",
        graft.functions.functions.damerau_levenshtein(col("__na"), col("__nb"))
          .cast("long"))
      .where(col("dist") <= 4)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  val damerauPairsSql: String =
    """WITH p AS (
         SELECT p_partkey AS id, p_name AS name,
                list_extract(string_split(p_name, ' '), len(string_split(p_name, ' '))) AS block
         FROM part)
       SELECT a.id AS id_a, b.id AS id_b,
              CAST(damerau_levenshtein(a.name, b.name) AS BIGINT) AS dist
       FROM (SELECT * FROM p WHERE id % 7 = 1) a
       JOIN (SELECT * FROM p WHERE id % 7 = 2) b USING (block)
       WHERE damerau_levenshtein(a.name, b.name) <= 4"""

  /**
   * `containment_pairs`: [[Dedup.containmentPairs]] — Broder containment
   * (`|S(A) ∩ S(B)| / |S(A)|`, exact integer ppm) over an augmented
   * corpus where every `doc_id % 5 == 2` document contributes a
   * 120-char-prefix "quote" twin (id + 1e6). The quote's shingles are a
   * near-subset of its source's (minus the windows touching the cut
   * token), so quote → source pairs clear the 60% gate while the reverse
   * direction (source → quote) is denominator-diluted and mostly does
   * not — the asymmetry Jaccard-based near-dup can never express. The
   * oracle replays tokenization, shingling, the df <= 50 boilerplate cap,
   * the inverted join and the integer division in DuckDB.
   */
  def containmentPairsQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents")
    val corpus = docs.select(col("doc_id").as("id"), col("text"))
      .unionAll(docs.filter(col("doc_id") % 5 === 2)
        .select((col("doc_id") + 1000000L).as("id"),
          substring(col("text"), 1, 120).as("text")))
    Dedup.containmentPairs(corpus, "id", "text",
      minContainPpm = 600000L, maxShingleDf = 50)
  }

  val containmentPairsSql: String =
    s"""WITH corpus AS (
         SELECT doc_id AS id, text FROM documents
         UNION ALL
         SELECT doc_id + 1000000 AS id, substring(text, 1, 120) AS text
         FROM documents WHERE doc_id % 5 = 2),
       tok AS (SELECT id, $Toks AS toks FROM corpus),
       shd AS (SELECT id, $SqlShingles AS sh FROM tok),
       sizes AS (SELECT id, CAST(len(sh) AS BIGINT) AS size_a FROM shd),
       ex AS (SELECT id, unnest(sh) AS g FROM shd),
       rare AS (SELECT g FROM ex GROUP BY g HAVING count(*) <= 50),
       r AS (SELECT e.id, e.g FROM ex e JOIN rare USING (g)),
       inter AS (
         SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
         FROM r a JOIN r b ON a.g = b.g AND a.id <> b.id GROUP BY 1, 2)
       SELECT id_a, id_b, inter, s.size_a,
              CAST((inter * 1000000) // s.size_a AS BIGINT) AS contain_ppm
       FROM inter JOIN sizes s ON s.id = id_a
       WHERE (inter * 1000000) // s.size_a >= 600000"""

  /**
   * `jaccard_join`: exact Jaccard set-similarity self-join
   * ([[Dedup.jaccardPairsExact]] — AllPairs/PPJoin prefix filtering) over
   * document word-5-shingle sets, against the NAIVE all-pairs oracle:
   * DuckDB cross-joins every id pair and intersects the full distinct
   * shingle lists, so the hash match proves the prefix + length filters
   * are lossless, not just self-consistent. A third of the docs gain an
   * appended-5-token near-copy (J = (n-4)/(n+1) for an n-token doc —
   * above the 0.7 gate from ~16 tokens up), so the result is the exact
   * near-dup pair set. Shingle sets are the PPJoin sweet spot (almost
   * every element is rare → tiny prefixes); tiny-vocabulary token sets
   * (e.g. part-name colors) have no rare elements for ANY exact
   * algorithm to exploit and belong on the LSH tier instead.
   */
  def jaccardJoinQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents")
    val corpus = docs.select(col("doc_id").as("id"), col("text"))
      .unionAll(docs.filter(col("doc_id") % 3 === 1)
        .select((col("doc_id") + 1000000L).as("id"),
          concat(col("text"), lit(" zz0 zz1 zz2 zz3 zz4")).as("text")))
    Dedup.jaccardPairsExact(
      corpus.withColumn("toks", Dedup.wordShingles(col("text"), 5)),
      "id", "toks", minJaccardPpm = 700000L)
  }

  val jaccardJoinSql: String =
    s"""WITH corpus AS (
         SELECT doc_id AS id, text FROM documents
         UNION ALL
         SELECT doc_id + 1000000 AS id,
                concat(text, ' zz0 zz1 zz2 zz3 zz4') AS text
         FROM documents WHERE doc_id % 3 = 1),
       tok AS (SELECT id, $Toks AS toks FROM corpus),
       base AS (
         SELECT id, $SqlShingles AS sh FROM tok
         WHERE len($SqlShingles) > 0),
       pairs AS (
         SELECT a.id AS id_a, b.id AS id_b,
                CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
                CAST(len(a.sh) AS BIGINT) AS size_a,
                CAST(len(b.sh) AS BIGINT) AS size_b
         FROM base a JOIN base b ON a.id < b.id)
       SELECT id_a, id_b, inter, size_a, size_b,
              CAST((inter * 1000000) // (size_a + size_b - inter) AS BIGINT)
                AS jaccard_ppm
       FROM pairs
       WHERE inter * 1000000 >= 700000 * (size_a + size_b - inter)"""

  /**
   * `pii_luhn`: Luhn-validated card scrubbing
   * ([[TextAnalysis.cardCandidates]] / [[TextAnalysis.luhnValid]] /
   * [[TextAnalysis.scrubCardNumbers]]) — per customer, a synthetic page
   * carries one space-grouped 16-digit run and one plain run, both
   * deterministic functions of `c_custkey`, so validity varies
   * data-dependently (~1 in 10 passes the checksum). Only checksum-passing
   * runs are masked; the oracle replays the candidate regex, the
   * reversed-digit double-and-fold sum, and the literal replaces in
   * DuckDB.
   */
  def piiLuhn(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val base = t(dir, "customer").selectExpr("c_custkey AS id",
      "concat(lpad(CAST((c_custkey * 7919 + 11) % 100000000 AS STRING), 8, '0')," +
        " lpad(CAST((c_custkey * 104729 + 97) % 100000000 AS STRING), 8, '0')) AS n1",
      "concat(lpad(CAST((c_custkey * 4973 + 3) % 100000000 AS STRING), 8, '0')," +
        " lpad(CAST((c_custkey * 31337 + 29) % 100000000 AS STRING), 8, '0')) AS n2")
      .withColumn("n1g", expr("concat(substring(n1, 1, 4), ' ', substring(n1, 5, 4)," +
        " ' ', substring(n1, 9, 4), ' ', substring(n1, 13, 4))"))
      .withColumn("text", expr("concat('user ', id, ' card ', n1g, ' alt ', n2, ' ok')"))
    base.select(col("id"),
      size(TextAnalysis.cardCandidates(col("text"))).cast("long").as("n_candidates"),
      size(TextAnalysis.validCardNumbers(col("text"))).cast("long").as("n_valid"),
      TextAnalysis.scrubCardNumbers(col("text")).as("scrubbed"))
  }

  val piiLuhnSql: String = {
    // separator-stripped reversed-digit Luhn sum of one candidate `cd`
    val strip = "regexp_replace(cd, '[ -]', '', 'g')"
    val digit = s"CAST(substring(reverse($strip), i, 1) AS INT)"
    val luhn = s"length($strip) BETWEEN 13 AND 19 AND " +
      s"list_sum(list_transform(range(1, length($strip) + 1), i -> " +
      s"CASE WHEN i % 2 = 0 THEN CASE WHEN 2 * $digit > 9 THEN 2 * $digit - 9 " +
      s"ELSE 2 * $digit END ELSE $digit END)) % 10 = 0"
    s"""WITH base AS (
         SELECT c_custkey AS id,
           lpad(CAST((c_custkey * 7919 + 11) % 100000000 AS VARCHAR), 8, '0') ||
             lpad(CAST((c_custkey * 104729 + 97) % 100000000 AS VARCHAR), 8, '0') AS n1,
           lpad(CAST((c_custkey * 4973 + 3) % 100000000 AS VARCHAR), 8, '0') ||
             lpad(CAST((c_custkey * 31337 + 29) % 100000000 AS VARCHAR), 8, '0') AS n2
         FROM customer),
       txt AS (
         SELECT id, n1, n2,
           substring(n1, 1, 4) || ' ' || substring(n1, 5, 4) || ' ' ||
             substring(n1, 9, 4) || ' ' || substring(n1, 13, 4) AS n1g
         FROM base),
       pages AS (
         SELECT id, n1g, n2,
           'user ' || id || ' card ' || n1g || ' alt ' || n2 || ' ok' AS text
         FROM txt),
       cand AS (
         SELECT id, n1g, n2, text,
           regexp_extract_all(text, '(^|[^0-9-])((?:[0-9][ -]?){12,18}[0-9])([^0-9-]|$$)', 2) AS cands
         FROM pages),
       v AS (
         SELECT id, n1g, n2, text, cands,
           list_filter(cands, cd -> $luhn) AS valid
         FROM cand)
       SELECT id, CAST(len(cands) AS BIGINT) AS n_candidates,
              CAST(len(valid) AS BIGINT) AS n_valid,
              CASE WHEN list_contains(valid, n2) THEN
                replace(CASE WHEN list_contains(valid, n1g)
                  THEN replace(text, n1g, '<CARD>') ELSE text END, n2, '<CARD>')
              ELSE CASE WHEN list_contains(valid, n1g)
                THEN replace(text, n1g, '<CARD>') ELSE text END END AS scrubbed
       FROM v"""
  }

  /**
   * `bm25_topk`: [[graft.ops.Retrieval.bm25TopK]] — three keyword queries
   * over the documents corpus, top-10 each by the exact fixed-point
   * BM25-style score (RSJ odds idf x1e6, saturating tf, length
   * normalization cross-multiplied by total tokens — every product in
   * DECIMAL(38,0)/HUGEINT, every division integer). The oracle replays
   * tokenization, the query-vocabulary semi-join, tf/df/corpus stats and
   * the full scoring arithmetic in DuckDB, ranking with the same
   * `(score desc, doc_id)` total order.
   */
  def bm25TopKQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val qs = Seq(("q1", "table scan merge"), ("q2", "slow query filter"),
      ("q3", "stream window customer")).toDF("query_id", "qtext")
    graft.ops.Retrieval.bm25TopK(t(dir, "documents"), "doc_id", "text",
      qs, "query_id", "qtext", k = 10)
  }

  val bm25TopKSql: String = {
    val qtoks = "list_filter(string_split_regex(lower(qtext), '[^a-z0-9]+'), x -> x <> '')"
    s"""WITH qs(query_id, qtext) AS (VALUES
         ('q1', 'table scan merge'), ('q2', 'slow query filter'),
         ('q3', 'stream window customer')),
       tok AS (SELECT doc_id, $Toks AS toks FROM documents),
       terms AS (SELECT doc_id, unnest(toks) AS term,
                        CAST(len(toks) AS BIGINT) AS dl FROM tok),
       qt AS (SELECT query_id, unnest(list_distinct($qtoks)) AS term FROM qs),
       stats AS (SELECT count(*) AS n, CAST(sum(len(toks)) AS BIGINT) AS t FROM tok),
       qdoc AS (SELECT tr.* FROM terms tr
                JOIN (SELECT DISTINCT term FROM qt) q USING (term)),
       tf AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
              FROM qdoc GROUP BY 1, 2),
       dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM qdoc GROUP BY 1),
       ts AS (SELECT q.query_id, f.doc_id,
                CAST((CAST(((s.n - d.df) * 2 + 1) AS HUGEINT) * 1000000 // (2 * d.df + 1))
                     * f.tf * 2200 * s.t //
                     (CAST(1000 AS HUGEINT) * f.tf * s.t +
                      12 * (CAST(25 AS HUGEINT) * s.t + 75 * f.dl * s.n))
                  AS BIGINT) AS s
              FROM tf f JOIN dfq d USING (term) JOIN qt q USING (term)
              CROSS JOIN stats s),
       sc AS (SELECT query_id, doc_id, CAST(sum(s) AS BIGINT) AS score_fp
              FROM ts GROUP BY 1, 2)
       SELECT query_id, doc_id, score_fp, rank FROM (
         SELECT query_id, doc_id, score_fp,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY score_fp DESC, doc_id) AS rank
         FROM sc)
       WHERE rank <= 10"""
  }

  /**
   * `rrf_fusion`: hybrid retrieval — the BM25 lexical ranking and a
   * term-overlap ranking ([[graft.ops.Retrieval.percolate]] match counts
   * through [[toRanking]]'s k-capped partial top-k) fused per query by
   * reciprocal-rank fusion ([[graft.ops.Retrieval.rrfFuse]], exact
   * `1e12 DIV (60 + rank)` fixed point). The oracle replays both
   * retrievers AND the fusion digit-for-digit; ranks, not scores, cross
   * the fusion boundary, so the two retrievers' incomparable score units
   * never meet.
   */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val qs = Seq(("q1", "table scan merge"), ("q2", "slow query filter"),
      ("q3", "stream window customer")).toDF("query_id", "qtext")
    val docs = t(dir, "documents")
    val lex = graft.ops.Retrieval
      .bm25TopK(docs, "doc_id", "text", qs, "query_id", "qtext", k = 20)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val overlap = graft.ops.Retrieval.toRanking(
      graft.ops.Retrieval
        .percolate(docs, "doc_id", "text", qs, "query_id", "qtext", minMatchPct = 1)
        .select(col("query_id"), col("doc_id"), col("n_matched")),
      "n_matched", k = 20)
    graft.ops.Retrieval.rrfFuse(Seq(lex, overlap), k0 = 60, k = 10)
  }

  val rrfFusionSql: String = {
    val qtoks = "list_filter(string_split_regex(lower(qtext), '[^a-z0-9]+'), x -> x <> '')"
    s"""WITH qs(query_id, qtext) AS (VALUES
         ('q1', 'table scan merge'), ('q2', 'slow query filter'),
         ('q3', 'stream window customer')),
       tok AS (SELECT doc_id, $Toks AS toks FROM documents),
       terms AS (SELECT doc_id, unnest(toks) AS term,
                        CAST(len(toks) AS BIGINT) AS dl FROM tok),
       qt AS (SELECT query_id, unnest(list_distinct($qtoks)) AS term FROM qs),
       stats AS (SELECT count(*) AS n, CAST(sum(len(toks)) AS BIGINT) AS t FROM tok),
       qdoc AS (SELECT tr.* FROM terms tr
                JOIN (SELECT DISTINCT term FROM qt) q USING (term)),
       tf AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
              FROM qdoc GROUP BY 1, 2),
       dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM qdoc GROUP BY 1),
       ts AS (SELECT q.query_id, f.doc_id,
                CAST((CAST(((s.n - d.df) * 2 + 1) AS HUGEINT) * 1000000 // (2 * d.df + 1))
                     * f.tf * 2200 * s.t //
                     (CAST(1000 AS HUGEINT) * f.tf * s.t +
                      12 * (CAST(25 AS HUGEINT) * s.t + 75 * f.dl * s.n))
                  AS BIGINT) AS s
              FROM tf f JOIN dfq d USING (term) JOIN qt q USING (term)
              CROSS JOIN stats s),
       sc AS (SELECT query_id, doc_id, CAST(sum(s) AS BIGINT) AS score_fp
              FROM ts GROUP BY 1, 2),
       lex AS (SELECT query_id, doc_id, rank FROM (
                 SELECT query_id, doc_id,
                        row_number() OVER (PARTITION BY query_id
                                           ORDER BY score_fp DESC, doc_id) AS rank
                 FROM sc) WHERE rank <= 20),
       dt AS (SELECT doc_id, unnest(list_distinct(toks)) AS term FROM tok),
       m AS (SELECT d.doc_id, q.query_id, count(*) AS n_matched
             FROM dt d JOIN qt q USING (term) GROUP BY 1, 2),
       ov AS (SELECT query_id, doc_id, rank FROM (
                SELECT query_id, doc_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY n_matched DESC, doc_id) AS rank
                FROM m) WHERE rank <= 20),
       u AS (SELECT * FROM lex UNION ALL SELECT * FROM ov),
       f AS (SELECT query_id, doc_id,
                    CAST(sum(1000000000000 // (60 + rank)) AS BIGINT) AS rrf_fp,
                    count(*) AS n_rankers
             FROM u GROUP BY 1, 2)
       SELECT query_id, doc_id, rrf_fp, n_rankers, cast(rank AS bigint) AS rank
       FROM (SELECT query_id, doc_id, rrf_fp, n_rankers,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY rrf_fp DESC, doc_id) AS rank
             FROM f)
       WHERE rank <= 10"""
  }

  /**
   * `anchor_text_profile`: [[Web.anchorTextProfile]] — top-3 anchor terms
   * per target host over a deterministic link frame (host from the
   * `host_pagerank` arithmetic, anchor text a 25-char prefix of the
   * linking page). The oracle replays tokenization, the (host, term)
   * count and a `(n desc, term)` row_number in DuckDB; the Spark side
   * ranks through the k-capped bounded partial, and the hash-match proves
   * the two agree.
   */
  def anchorTextProfileQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val links = t(dir, "documents").select(
      concat(lit("h"), ((col("doc_id") * 7 + 13) % 250).cast("string"),
        lit(".example")).as("host"),
      substring(col("text"), 1, 25).as("anchor"))
    Web.anchorTextProfile(links, "host", "anchor", k = 3)
  }

  val anchorTextProfileSql: String = {
    val atoks = "list_filter(string_split_regex(lower(anchor), '[^a-z0-9]+'), x -> x <> '')"
    s"""WITH links AS (
         SELECT 'h' || ((doc_id * 7 + 13) % 250) || '.example' AS host,
                substring(text, 1, 25) AS anchor
         FROM documents),
       terms AS (SELECT host, unnest($atoks) AS term FROM links),
       counts AS (SELECT host, term, count(*) AS n FROM terms GROUP BY 1, 2)
       SELECT host, term, n, rank FROM (
         SELECT host, term, n,
                row_number() OVER (PARTITION BY host ORDER BY n DESC, term) AS rank
         FROM counts)
       WHERE rank <= 3"""
  }

  /**
   * `inverted_index`: [[graft.ops.Retrieval.invertedIndex]] — exact df per
   * term plus the 10 smallest posting doc ids (the deterministic,
   * partitioning-independent cap rule of the bounded `collect_bottom_k`
   * aggregate). Oracle: per-doc distinct terms, a plain count, and an
   * ordered-list slice in DuckDB. The array postings are joined to a
   * comma-separated string on BOTH engines: the harness compare sorts
   * result columns with pandas, which cannot hash/sort array cells, so
   * the query surface must stay scalar-typed even though the operator
   * API keeps the array.
   */
  def invertedIndexQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.Retrieval.invertedIndex(t(dir, "documents"), "doc_id", "text",
        maxPostings = 10)
      .select(col("term"), col("df"),
        array_join(transform(col("postings"), _.cast("string")), ",")
          .as("postings_csv"))
  }

  val invertedIndexSql: String =
    s"""WITH dt AS (SELECT doc_id, unnest(list_distinct($Toks)) AS term FROM documents)
       SELECT term, CAST(count(*) AS BIGINT) AS df,
              array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, 10), ',') AS postings_csv
       FROM dt GROUP BY term"""

  /**
   * `readability`: [[TextAnalysis.readabilityStats]] — word/sentence/
   * vowel-group-syllable counts and the x1000 fixed-point Flesch reading
   * ease over synthetic multi-sentence pages (the corpus text carries no
   * terminators, so the page adds them deterministically). Every count
   * and the floored-DIV score replay exactly in DuckDB.
   */
  def readabilityQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val page = concat(col("text"), lit(". "), substring(col("text"), 1, 60),
      lit("! "), substring(col("text"), 61, 40), lit("?"))
    val stats = TextAnalysis.readabilityStats(page)
    t(dir, "documents").select(
      col("doc_id") +: stats.map { case (n, c) => c.as(n) }: _*)
  }

  val readabilitySql: String = {
    val ptoks = "list_filter(string_split_regex(lower(page), '[^a-z0-9]+'), x -> x <> '')"
    s"""WITH pages AS (
         SELECT doc_id,
           text || '. ' || substring(text, 1, 60) || '! ' ||
             substring(text, 61, 40) || '?' AS page
         FROM documents),
       counted AS (
         SELECT doc_id,
           CAST(len($ptoks) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(page, '[^.!?]+[.!?]+|[^.!?]+$$', 0)) AS BIGINT)
             AS n_sentences,
           CAST(length(regexp_replace(regexp_replace(lower(page), '[aeiouy]+', 'V', 'g'),
             '[^V]', '', 'g')) AS BIGINT) AS n_syllables
         FROM pages)
       SELECT doc_id, n_words, n_sentences, n_syllables,
              CASE WHEN n_words > 0 AND n_sentences > 0 THEN
                206835 - (1015 * n_words) // n_sentences
                       - (84600 * n_syllables) // n_words
              END AS flesch_fp
       FROM counted"""
  }

  /**
   * `domain_dedup_profile`: [[Web.domainDedupProfile]] — per-domain
   * exact-duplicate pressure over 40-char text prefixes (the full
   * word-soup texts rarely collide; prefixes collide realistically, so
   * `dup_ppm` varies per domain). The measurement that tells a curation
   * team where its dedup budget goes.
   */
  def domainDedupProfileQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    Web.domainDedupProfile(
      t(dir, "documents").withColumn("t40", substring(col("text"), 1, 40)),
      "source", "t40")
  }

  val domainDedupProfileSql: String =
    """WITH f AS (SELECT source AS domain, md5(substring(text, 1, 40)) AS fp
                  FROM documents),
       g AS (SELECT domain, fp, count(*) AS n FROM f GROUP BY 1, 2)
       SELECT domain, CAST(sum(n) AS BIGINT) AS n_docs,
              CAST(count(*) AS BIGINT) AS n_unique,
              ((CAST(sum(n) AS BIGINT) - count(*)) * 1000000)
                // CAST(sum(n) AS BIGINT) AS dup_ppm
       FROM g GROUP BY domain"""

  /**
   * `lang_confusion`: the language-ID audit matrix — labeled `lang` vs
   * [[TextAnalysis.languageId]] prediction, counted. The oracle reuses
   * the full generated lang-ID SQL twin as a CTE, so the same constants
   * drive both sides.
   */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "documents")
      .select(col("lang"), TextAnalysis.languageId(col("text")).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred")).agg(count(lit(1)).as("n"))
  }

  val langConfusionSql: String =
    s"""WITH pred AS ($langIdSql)
       SELECT d.lang, p.lang_pred, count(*) AS n
       FROM documents d JOIN pred p USING (doc_id)
       GROUP BY 1, 2"""

  /** The fixed vocabulary of the `vocab_coverage` query (both engines). */
  private val CoverageVocab = Seq("the", "fast", "key", "order", "sort", "table",
    "scan", "merge", "part", "spark", "group", "query", "row", "data", "filter",
    "customer", "join", "window", "stream", "slow")

  /**
   * `vocab_coverage`: [[TextAnalysis.vocabCoverage]] — per-document OOV
   * rate against a fixed 20-term vocabulary (broadcast anti-join on the
   * Spark side, inline NOT IN on the oracle side — same set, exact
   * integer ppm).
   */
  def vocabCoverageQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    TextAnalysis.vocabCoverage(t(dir, "documents"), "doc_id", "text",
      CoverageVocab.toDF("term"), "term")
  }

  val vocabCoverageSql: String = {
    val set = CoverageVocab.map(w => s"'$w'").mkString(", ")
    s"""WITH tok AS (SELECT doc_id, $Toks AS toks FROM documents),
       c AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(toks, t -> t NOT IN ($set))) AS BIGINT) AS n_oov
             FROM tok)
       SELECT doc_id, n_tokens, n_oov,
              CASE WHEN n_tokens > 0 THEN (n_oov * 1000000) // n_tokens END AS oov_ppm
       FROM c"""
  }

  /**
   * `collocations`: [[TextAnalysis.collocations]] — top-20 adjacent word
   * pairs by exact fixed-point PMI ratio (`n_pair * N * 1e6 DIV
   * (n_w1 * n_w2)`, min pair count 5). The oracle replays the bigram
   * kernel's gram definition, both count aggregations and the HUGEINT
   * arithmetic, ranking with the identical `(score desc, w1, w2)` total
   * order.
   */
  def collocationsQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    TextAnalysis.collocations(t(dir, "documents"), "text", k = 20, minPairCount = 5)
  }

  val collocationsSql: String =
    s"""WITH tok AS (SELECT $Toks AS toks FROM documents),
       uni AS (SELECT w, count(*) AS n_w
               FROM (SELECT unnest(toks) AS w FROM tok) GROUP BY w),
       tot AS (SELECT CAST(sum(n_w) AS BIGINT) AS n FROM uni),
       pairs AS (
         SELECT pair, count(*) AS n_pair FROM (
           SELECT unnest(list_transform(range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i + 1])) AS pair
           FROM tok)
         GROUP BY pair HAVING count(*) >= 5),
       sc AS (SELECT string_split(pair, ' ')[1] AS w1,
                     string_split(pair, ' ')[2] AS w2, n_pair FROM pairs),
       j AS (SELECT s.w1, s.w2, s.n_pair,
               CAST(CAST(s.n_pair AS HUGEINT) * t.n * 1000000 //
                 (CAST(u1.n_w AS HUGEINT) * u2.n_w) AS BIGINT) AS score_fp
             FROM sc s JOIN uni u1 ON s.w1 = u1.w JOIN uni u2 ON s.w2 = u2.w
             CROSS JOIN tot t)
       SELECT w1, w2, n_pair, score_fp FROM j
       ORDER BY score_fp DESC, w1, w2 LIMIT 20"""

  /**
   * `exact_percentiles`: [[graft.ops.Sketches.exactPercentiles]] — exact
   * nearest-rank p50/p90/p99 of event values (in exact cents) per event
   * type, computed with the no-one-reducer range-partition recipe. The
   * oracle replays the nearest-rank definition (`ceil(n*p/100)` via a
   * per-group row_number) in DuckDB; the hash-match is the
   * distributed-equals-definition proof, same as the global-order family.
   */
  def exactPercentilesQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val v = events(dir).select(col("event_type"), cents(col("value")).as("cents"))
    graft.ops.Sketches.exactPercentiles(v, "event_type", "cents", Seq(50, 90, 99))
  }

  val exactPercentilesSql: String =
    """WITH v AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c
                  FROM events WHERE value IS NOT NULL),
       n AS (SELECT event_type, count(*) AS n FROM v GROUP BY 1),
       r AS (SELECT event_type, c,
               row_number() OVER (PARTITION BY event_type ORDER BY c) AS rk
             FROM v),
       t AS (SELECT event_type, p, (n * p + 99) // 100 AS target
             FROM n CROSS JOIN (SELECT unnest([50, 90, 99]) AS p))
       SELECT t.event_type, CAST(t.p AS BIGINT) AS pct, r.c AS cents
       FROM t JOIN r ON r.event_type = t.event_type AND r.rk = t.target"""

  /**
   * `value_outliers`: [[graft.ops.Drift.robustValueProfile]] — per-type
   * median/MAD/outlier profile of event values in exact cents (both
   * medians are exact nearest-rank percentiles through the no-one-reducer
   * recipe; outlier test `|v - med| * 100 > 300 * mad`). Oracle replays
   * both nearest-rank medians, the deviation join and the counts in
   * DuckDB.
   */
  def valueOutliers(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val v = events(dir).select(col("event_type"), cents(col("value")).as("cents"))
    graft.ops.Drift.robustValueProfile(v, "event_type", "cents", kX100 = 300L)
  }

  val valueOutliersSql: String =
    """WITH v AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c
                  FROM events WHERE value IS NOT NULL),
       n AS (SELECT event_type, count(*) AS n FROM v GROUP BY 1),
       r AS (SELECT event_type, c,
               row_number() OVER (PARTITION BY event_type ORDER BY c) AS rk FROM v),
       med AS (SELECT n.event_type, r.c AS median
               FROM n JOIN r ON r.event_type = n.event_type
                 AND r.rk = (n.n * 50 + 99) // 100),
       d AS (SELECT v.event_type, v.c, abs(v.c - m.median) AS dev, m.median
             FROM v JOIN med m USING (event_type)),
       dn AS (SELECT event_type, count(*) AS n FROM d GROUP BY 1),
       dr AS (SELECT event_type, dev,
                row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rk FROM d),
       mad AS (SELECT dn.event_type, dr.dev AS mad
               FROM dn JOIN dr ON dr.event_type = dn.event_type
                 AND dr.rk = (dn.n * 50 + 99) // 100)
       SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
              min(d.median) AS median, min(mad.mad) AS mad,
              CAST(sum(CASE WHEN d.dev * 100 > 300 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
              (CAST(sum(CASE WHEN d.dev * 100 > 300 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS outlier_ppm
       FROM d JOIN mad USING (event_type) GROUP BY d.event_type"""

  /**
   * `percolate`: [[graft.ops.Retrieval.percolate]] — three standing
   * keyword queries matched against every document at a 60%
   * minimum-should-match. Oracle replays distinct-term explode, the
   * query-term join and the threshold arithmetic in DuckDB.
   */
  def percolateQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val qs = Seq(("alerts_scan", "table scan merge sort"),
      ("alerts_perf", "slow query filter"),
      ("alerts_user", "customer stream window")).toDF("query_id", "qtext")
    graft.ops.Retrieval.percolate(t(dir, "documents"), "doc_id", "text",
      qs, "query_id", "qtext", minMatchPct = 60)
  }

  val percolateSql: String = {
    val qtoks = "list_filter(string_split_regex(lower(qtext), '[^a-z0-9]+'), x -> x <> '')"
    s"""WITH qs(query_id, qtext) AS (VALUES
         ('alerts_scan', 'table scan merge sort'), ('alerts_perf', 'slow query filter'),
         ('alerts_user', 'customer stream window')),
       qt AS (SELECT query_id, unnest(list_distinct($qtoks)) AS term FROM qs),
       qn AS (SELECT query_id, count(*) AS n_terms FROM qt GROUP BY 1),
       dt AS (SELECT doc_id, unnest(list_distinct($Toks)) AS term FROM documents),
       m AS (SELECT d.doc_id, q.query_id, count(*) AS n_matched
             FROM dt d JOIN qt q USING (term) GROUP BY 1, 2)
       SELECT m.doc_id, m.query_id, m.n_matched, qn.n_terms
       FROM m JOIN qn USING (query_id)
       WHERE m.n_matched * 100 >= qn.n_terms * 60"""
  }

  /**
   * `cluster_sizes`: the near-dup cluster size histogram — how much of
   * the duplicate mass sits in pairs vs large families (the shape that
   * decides whether keep-first vs keep-best matters and how hot the LSH
   * buckets run). Cluster labels from [[Dedup.duplicateClusters]]; the
   * oracle inherits [[OracleLabelPropRounds]] via [[dupClusterCtes]].
   */
  def clusterSizes(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    dupClusters(spark, dir)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("__size"))
      .groupBy(col("__size").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
  }

  val clusterSizesSql: String =
    s"""WITH $dupClusterCtes,
       sizes AS (SELECT cluster_id, count(*) AS cluster_size
                 FROM l$OracleLabelPropRounds GROUP BY cluster_id)
       SELECT cluster_size, count(*) AS n_clusters FROM sizes GROUP BY cluster_size"""

  // =====================================================================
  // Registry
  // =====================================================================

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q1_pricing_summary", q1PricingSummary _, Some(q1Sql)),
    ("q3_shipping_priority", q3ShippingPriority _, Some(q3Sql)),
    ("q5_region_revenue", q5RegionRevenue _, Some(q5Sql)),
    ("top_orders_per_customer", topOrdersPerCustomer _, Some(topOrdersSql)),
    ("distinct_event_types", distinctEventTypes _, Some(distinctEventTypesSql)),
    ("events_daily_rollup", eventsDailyRollup _, Some(eventsDailyRollupSql)),
    ("date_filter", dateFilter _, Some(dateFilterSql)),
    ("cleanse_nullify", cleanseNullify _, Some(cleanseNullifySql)),
    ("stage_pipeline", stagePipeline _, Some(stagePipelineSql)),
    ("warehouse_roundtrip", warehouseRoundtrip _, Some(warehouseRoundtripSql)),
    ("sessionize_events", sessionizeEvents _, Some(sessionizeEventsSql)),
    ("session_paths", sessionPaths _, Some(sessionPathsSql)),
    ("orders_pivot", ordersPivot _, Some(ordersPivotSql)),
    ("q14_promo_revenue", q14PromoRevenue _, Some(q14Sql)),
    ("q7_nation_volume", q7NationVolume _, Some(q7Sql)),
    ("q8_market_share", q8MarketShare _, Some(q8Sql)),
    ("orders_no_late_items", ordersNoLateItems _, Some(ordersNoLateItemsSql)),
    ("asof_join", asofJoin _, Some(asofJoinSql)),
    ("range_join_count", rangeJoinCount _, Some(rangeJoinCountSql)),
    ("overlap_join_pairs", overlapJoinPairs _, Some(overlapJoinPairsSql)),
    ("q4_order_priority", q4OrderPriority _, Some(q4Sql)),
    ("q6_revenue", q6Revenue _, Some(q6Sql)),
    ("q9_profit_by_nation", q9ProfitByNation _, Some(q9Sql)),
    ("q10_returned_items", q10ReturnedItems _, Some(q10Sql)),
    ("q11_important_parts", q11ImportantParts _, Some(q11Sql)),
    ("q12_priority_lines", q12PriorityLines _, Some(q12Sql)),
    ("q15_top_supplier", q15TopSupplier _, Some(q15Sql)),
    ("q16_supplier_variety", q16SupplierVariety _, Some(q16Sql)),
    ("q17_small_qty_revenue", q17SmallQtyRevenue _, Some(q17Sql)),
    ("q19_disjunctive_revenue", q19DisjunctiveRevenue _, Some(q19Sql)),
    ("q20_heavy_suppliers", q20HeavySuppliers _, Some(q20Sql)),
    ("q21_sole_blame", q21SoleBlame _, Some(q21Sql)),
    ("q18_large_orders", q18LargeOrders _, Some(q18Sql)),
    ("cheapest_supplier", cheapestSupplier _, Some(cheapestSupplierSql)),
    ("rollup_orders", rollupOrders _, Some(rollupOrdersSql)),
    ("cube_revenue", cubeRevenue _, Some(cubeRevenueSql)),
    ("q13_custdist", q13CustDist _, Some(q13Sql)),
    ("q22_acctbal", q22AcctBal _, Some(q22Sql)),
    ("percentile_values", percentileValues _, Some(percentileValuesSql)),
    ("moving_avg", movingAvg _, Some(movingAvgSql)),
    ("weekly_revenue", weeklyRevenue _, Some(weeklyRevenueSql)),
    ("json_extract", jsonExtract _, Some(jsonExtractSql)),
    ("multimodal_frames", multimodalFrames _, Some(multimodalFramesSql)),
    ("dedup_exact", dedupExact _, Some(dedupExactSql)),
    ("minhash_signatures", minhashSignatures _, Some(minhashSignaturesSql)),
    ("lsh_candidate_pairs", lshCandidatePairs _, Some(lshCandidatePairsSql)),
    ("lsh_salted_pairs", lshSaltedPairs _, Some(lshSaltedPairsSql)),
    ("contamination_hits", contaminationHits _, Some(contaminationHitsSql)),
    ("decontaminated_docs", decontaminatedDocs _, Some(decontaminatedDocsSql)),
    ("near_dup_pairs", nearDupPairs _, Some(nearDupPairsSql)),
    ("simhash_fingerprints", simhashFingerprints _, Some(simhashFingerprintsSql)),
    ("simhash_neardup", simhashNeardup _, Some(simhashNeardupSql)),
    ("boilerplate_lines", boilerplateLines _, Some(boilerplateLinesSql)),
    ("span_dedup", spanDedup _, Some(spanDedupSql)),
    ("dedup_incremental_bloom", dedupIncrementalBloom _, Some(dedupIncrementalBloomSql)),
    ("corpus_mix", corpusMix _, Some(corpusMixSql)),
    ("hash_split", hashSplitCounts _, Some(hashSplitCountsSql)),
    ("text_quality", textQuality _, Some(textQualitySql)),
    ("quality_score", qualityScore _, Some(qualityScoreSql)),
    ("lang_id", langId _, Some(langIdSql)),
    ("token_counts", tokenCounts _, Some(tokenCountsSql)),
    ("pii_scrub", piiScrub _, Some(piiScrubSql)),
    ("html_extract", htmlExtract _, Some(htmlExtractSql)),
    ("main_content", mainContentQuery _, Some(mainContentSql)),
    ("url_profile", urlProfile _, Some(urlProfileSql)),
    ("url_dedup", urlDedup _, Some(urlDedupSql)),
    ("intra_doc_dedup", intraDocDedup _, Some(intraDocDedupSql)),
    ("sentence_stats", sentenceStats _, Some(sentenceStatsSql)),
    ("sentence_chunks", sentenceChunks _, Some(sentenceChunksSql)),
    ("domain_quality", domainQuality _, Some(domainQualitySql)),
    ("top_ngrams", topNgrams _, Some(topNgramsSql)),
    ("contamination", contamination _, Some(contaminationSql)),
    ("quality_filter", qualityFilter _, Some(qualityFilterSql)),
    ("doc_fingerprints", docFingerprints _, Some(docFingerprintsSql)),
    ("ann_bruteforce_topk", annBruteforceTopK _, Some(annBruteforceTopKSql)),
    ("hashed_tf_topk", hashedTfTopK _, Some(hashedTfTopKSql)),
    ("ann_lsh_buckets", annLshBuckets _, Some(annLshBucketsSql)),
    ("ann_ivf_topk", annIvfTopK _, Some(annIvfTopKSql)),
    ("ann_multiprobe", annMultiprobe _, Some(annMultiprobeSql)),
    ("ann_hamming_topk", annHammingTopK _, Some(annHammingTopKSql)),
    ("ann_projected_topk", annProjectedTopK _, Some(annProjectedTopKSql)),
    ("dup_clusters", dupClusters _, Some(dupClustersSql)),
    ("embedding_neardup", embeddingNeardup _, Some(embeddingNeardupSql)),
    ("semantic_dedup", semanticDedup _, Some(semanticDedupSql)),
    ("pack_sequences", packSequences _, Some(packSequencesSql)),
    ("stratified_sample", stratifiedSample _, Some(stratifiedSampleSql)),
    ("target_mix_sample", targetMixQ _, Some(targetMixSql)),
    ("doc_repetition", docRepetition _, Some(docRepetitionSql)),
    ("ngram_repetition", ngramRepetition _, Some(ngramRepetitionSql)),
    ("funnel_steps", funnelSteps _, Some(funnelStepsSql)),
    ("funnel_window", funnelWindow _, Some(funnelWindowSql)),
    ("vocab_stats", vocabStats _, Some(vocabStatsSql)),
    ("tfidf_top_terms", tfidfTopTerms _, Some(tfidfTopTermsSql)),
    ("chunk_documents", chunkDocuments _, Some(chunkDocumentsSql)),
    ("multimodal_meta", multimodalMeta _, Some(multimodalMetaSql)),
    ("source_cap", sourceCapQ _, Some(sourceCapSql)),
    ("weighted_sample", weightedSample _, Some(weightedSampleSql)),
    ("bpe_pairs", bpePairsQ _, Some(bpePairsSql)),
    ("bpe_tokenize", bpeTokenize _, Some(bpeTokenizeSql)),
    ("typicality_score", typicalityScoreQ _, Some(typicalityScoreSql)),
    ("typicality_bigram", typicalityBigramQ _, Some(typicalityBigramSql)),
    ("typicality_backoff", typicalityBackoffQ _, Some(typicalityBackoffSql)),
    ("mix_plan", mixPlanQ _, Some(mixPlanSql)),
    ("kmeans_update", kmeansUpdateQ _, Some(kmeansUpdateSql)),
    ("snapshot_diff", snapshotDiffQ _, Some(snapshotDiffSql)),
    ("scd2_history", scd2History _, Some(scd2HistorySql)),
    ("embedding_outliers", embeddingOutliers _, Some(embeddingOutliersSql)),
    ("asof_forward", asofForward _, Some(asofForwardSql)),
    ("asof_nearest", asofNearest _, Some(asofNearestSql)),
    ("dedup_keep_best", dedupKeepBest _, Some(dedupKeepBestSql)),
    ("distinct_users_sketch", distinctUsersSketch _, None),
    ("distinct_users_exact", distinctUsersExact _, Some(distinctUsersExactSql)),
    ("value_quantiles_sketch", valueQuantilesSketch _, Some(valueQuantilesSketchSql)),
    ("heavy_hitters_sketch", heavyHittersSketch _, Some(heavyHittersSketchSql)),
    ("cms_counts", cmsCounts _, Some(cmsCountsSql)),
    ("leakage_safe_split", leakageSafeSplitQ _, Some(leakageSafeSplitSql)),
    ("vocab_drift", vocabDriftQ _, Some(vocabDriftSql)),
    ("concurrency_profile", concurrencyProfile _, Some(concurrencyProfileSql)),
    ("time_weighted_load", timeWeightedLoad _, Some(timeWeightedLoadSql)),
    ("basket_lift", basketLift _, Some(basketLiftSql)),
    ("rfm_segments", rfmSegments _, Some(rfmSegmentsSql)),
    ("pareto_parts", paretoParts _, Some(paretoPartsSql)),
    ("record_days", recordDays _, Some(recordDaysSql)),
    ("gap_fill", gapFillRevenue _, Some(gapFillRevenueSql)),
    ("ewma_revenue", ewmaRevenue _, Some(ewmaRevenueSql)),
    ("lag_correlation", lagCorrelation _, Some(lagCorrelationSql)),
    ("zorder_parts", zorderParts _, Some(zorderPartsSql)),
    ("type_diversity", typeDiversity _, Some(typeDiversitySql)),
    ("cusum_revenue", cusumRevenue _, Some(cusumRevenueSql)),
    ("dow_profile", dowProfile _, Some(dowProfileSql)),
    ("trailing_revenue", trailingRevenue _, Some(trailingRevenueSql)),
    ("value_histogram", valueHistogram _, Some(valueHistogramSql)),
    ("anchor_texts", anchorTexts _, Some(anchorTextsSql)),
    ("attribution_last", attributionLast _, Some(attributionLastSql)),
    ("attribution_first", attributionFirst _, Some(attributionFirstSql)),
    ("attribution_linear", attributionLinear _, Some(attributionLinearSql)),
    ("attribution_position", attributionPosition _, Some(attributionPositionSql)),
    ("dq_checks", dqChecks _, Some(dqChecksSql)),
    ("dq_profile", dqProfile _, Some(dqProfileSql)),
    ("ingest_anomalies", ingestAnomalies _, Some(ingestAnomaliesSql)),
    ("key_skew_profile", keySkewProfile _, Some(keySkewProfileSql)),
    ("event_transitions", eventTransitions _, Some(eventTransitionsSql)),
    ("retention_cohorts", retentionCohorts _, Some(retentionCohortsSql)),
    ("near_dedup_keep_best", nearDedupKeepBest _, Some(nearDedupKeepBestSql)),
    ("cjk_token_stats", cjkTokenStats _, Some(cjkTokenStatsSql)),
    ("cjk_near_dup", cjkNearDup _, Some(cjkNearDupSql)),
    ("token_budget_cut", tokenBudgetCut _, Some(tokenBudgetCutSql)),
    ("token_budget_per_group", tokenBudgetPerGroup _, Some(tokenBudgetPerGroupSql)),
    ("url_filter", urlFilter _, Some(urlFilterSql)),
    ("training_shuffle", trainingShuffle _, Some(trainingShuffleSql)),
    ("ann_quantized_topk", annQuantizedTopK _, Some(annQuantizedTopKSql)),
    ("decontaminate_sentences", decontaminateSentences _, Some(decontaminateSentencesSql)),
    ("ccnet_buckets", ccnetBuckets _, Some(ccnetBucketsSql)),
    ("embedding_drift", embeddingDrift _, Some(embeddingDriftSql)),
    ("extract_links", extractLinksQ _, Some(extractLinksSql)),
    ("host_pagerank", hostPagerank _, Some(hostPagerankSql)),
    ("host_triangles", hostTriangles _, Some(hostTrianglesSql)),
    ("host_communities", hostCommunities _, Some(hostCommunitiesSql)),
    ("host_kcore", hostKcore _, Some(hostKcoreSql)),
    ("host_reach", hostReach _, Some(hostReachSql)),
    ("ols_trend", olsTrend _, Some(olsTrendSql)),
    ("ab_test", abTest _, Some(abTestSql)),
    ("cumulative_users", cumulativeUsers _, Some(cumulativeUsersSql)),
    ("benford_profile", benfordPrices _, Some(benfordPricesSql)),
    ("fuzzy_join", fuzzyJoin _, Some(fuzzyJoinSql)),
    ("damerau_pairs", damerauPairs _, Some(damerauPairsSql)),
    ("sorted_neighborhood", sortedNeighborhood _, Some(sortedNeighborhoodSql)),
    ("containment_pairs", containmentPairsQ _, Some(containmentPairsSql)),
    ("jaccard_join", jaccardJoinQ _, Some(jaccardJoinSql)),
    ("pii_luhn", piiLuhn _, Some(piiLuhnSql)),
    ("bm25_topk", bm25TopKQ _, Some(bm25TopKSql)),
    ("rrf_fusion", rrfFusion _, Some(rrfFusionSql)),
    ("anchor_text_profile", anchorTextProfileQ _, Some(anchorTextProfileSql)),
    ("inverted_index", invertedIndexQ _, Some(invertedIndexSql)),
    ("readability", readabilityQ _, Some(readabilitySql)),
    ("host_hits", hostHits _, Some(hostHitsSql)),
    ("host_degrees", hostDegrees _, Some(hostDegreesSql)),
    ("domain_dedup_profile", domainDedupProfileQ _, Some(domainDedupProfileSql)),
    ("lang_confusion", langConfusion _, Some(langConfusionSql)),
    ("vocab_coverage", vocabCoverageQ _, Some(vocabCoverageSql)),
    ("collocations", collocationsQ _, Some(collocationsSql)),
    ("exact_percentiles", exactPercentilesQ _, Some(exactPercentilesSql)),
    ("value_outliers", valueOutliers _, Some(valueOutliersSql)),
    ("percolate", percolateQ _, Some(percolateSql)),
    ("cluster_sizes", clusterSizes _, Some(clusterSizesSql)))
}
