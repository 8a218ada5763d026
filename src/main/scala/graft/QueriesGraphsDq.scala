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
 * Data-quality screens, anomaly/skew/transition/cohort profiles, the
 * host-graph six-pack, A/B + OLS exact statistics.
 *
 * One battery family of [[Queries]] — split out for maintainability; the
 * query set and every definition are unchanged.
 */
private[graft] trait QueriesGraphsDq extends QueryHelpers { this: QueryBattery =>
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
  private[graft] def linkPageHtml: Column = {
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

  private[graft] val sqlLinkPages: String =
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

  private[graft] val sqlAnchorPat = """(?i)<a\s[^>]*href="([^"]+)"[^>]*>([^<]*)</a>"""

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
  private[graft] def linkHostEdges(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val pages = t(dir, "documents").select(col("doc_id"), linkPageHtml.as("html"))
    val links = Web.extractLinks(pages, "doc_id", "html")
    links.select(
      concat(lit("h"), (col("doc_id") % 250).cast("string"), lit(".example")).as("src"),
      Web.urlHost(col("href")).as("dst"))
  }

  /** DuckDB twin of [[linkHostEdges]]: CTE chain ending in `edges(src, dst)`. */
  private[graft] val sqlHostEdgesCtes: String =
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
   * `cuped_adjust`: CUPED variance-reduced A/B means readout
   * ([[graft.ops.Stats.cupedAdjust]]) — per-user spend split at
   * 2024-01-16 into a pre-experiment covariate `x_cents` and an
   * experiment metric `y_cents`, arms by even/odd user id, cohorts by
   * `user_id % 3`; θ fits POOLED across arms per cohort and every
   * composed truncated division (means, θ, the adjustment) replays
   * digit-for-digit in HUGEINT.
   */
  def cupedAdjust(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val cut = to_timestamp(lit("2024-01-16"))
    val perUser = events(dir).where(col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        coalesce(sum(when(col("ts") < cut, cents(col("value")))), lit(0L))
          .as("x_cents"),
        coalesce(sum(when(col("ts") >= cut, cents(col("value")))), lit(0L))
          .as("y_cents"))
      .withColumn("cohort", (col("user_id") % 3).cast("long"))
      .withColumn("arm", (col("user_id") % 2).cast("long"))
    graft.ops.Stats.cupedAdjust(perUser, Seq("cohort"), "arm",
      "y_cents", "x_cents")
  }

  val cupedAdjustSql: String =
    """WITH u AS (
         SELECT user_id,
           CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS HUGEINT) AS x,
           CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS HUGEINT) AS y
         FROM events WHERE value IS NOT NULL GROUP BY 1),
       a AS (
         SELECT CAST(user_id % 3 AS BIGINT) AS cohort,
                CAST(user_id % 2 AS BIGINT) AS arm,
                CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
                sum(x * y) AS sxy, sum(x * x) AS sxx
         FROM u GROUP BY 1, 2),
       p AS (
         SELECT cohort, arm, n, sx, sy,
                sum(n) OVER w AS tn, sum(sx) OVER w AS tx, sum(sy) OVER w AS ty,
                sum(sxy) OVER w AS txy, sum(sxx) OVER w AS txx
         FROM a WINDOW w AS (PARTITION BY cohort))
       SELECT cohort, arm, CAST(n AS BIGINT) AS n,
         CAST(sy * 1000000 // n AS BIGINT) AS mean_y_micro,
         CAST(CASE WHEN tn * txx - tx * tx = 0 THEN NULL
              ELSE (tn * txy - tx * ty) * 1000000 // (tn * txx - tx * tx)
              END AS BIGINT) AS theta_ppm,
         CAST(CASE WHEN tn * txx - tx * tx = 0 THEN sy * 1000000 // n
              ELSE sy * 1000000 // n
                   - ((tn * txy - tx * ty) * 1000000 // (tn * txx - tx * tx))
                     * (sx * 1000000 // n - tx * 1000000 // tn) // 1000000
              END AS BIGINT) AS adj_mean_y_micro
       FROM p"""

  /**
   * `sample_ess`: Kish effective sample size of the spend-weighted event
   * sample per event type ([[graft.ops.Stats.effectiveSampleSize]]) —
   * the diagnostic every weighted sampling step owes its consumer: how
   * many EFFECTIVE rows survive the weighting. `(Σw)²·1e6 DIV Σw²` and
   * the per-row share, one truncated division each.
   */
  def sampleEss(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).where(col("value").isNotNull)
      .select(col("event_type"), cents(col("value")).as("w"))
    graft.ops.Stats.effectiveSampleSize(ev, Seq("event_type"), "w")
  }

  val sampleEssSql: String =
    """WITH e AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS w
           FROM events WHERE value IS NOT NULL),
       g AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(CAST(w AS HUGEINT)) AS HUGEINT) AS sw,
               CAST(sum(CAST(w AS HUGEINT) * w) AS HUGEINT) AS sww
             FROM e GROUP BY 1)
       SELECT event_type, CAST(n AS BIGINT) AS n,
              CAST(CASE WHEN sww = 0 THEN NULL
                   ELSE sw * sw * 1000000 // sww END AS BIGINT) AS ess_scaled,
              CAST(CASE WHEN sww = 0 THEN NULL
                   ELSE sw * sw * 1000000 // (n * sww) END AS BIGINT) AS ess_ppm
       FROM g"""

  /**
   * `srm_check`: sample-ratio-mismatch guardrail per event type
   * ([[graft.ops.Stats.srmCheck]]) — the equal-split goodness-of-fit on
   * the even/odd-user arm counts, single-division exact
   * `Σ(k·o − n)²·1e6 DIV (n·k)`: the test every A/B readout must pass
   * before its metrics are believed.
   */
  def srmCheck(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(col("event_type"),
      (col("user_id") % 2).cast("long").as("arm"))
    graft.ops.Stats.srmCheck(ev, Seq("event_type"), "arm")
  }

  val srmCheckSql: String =
    """WITH a AS (SELECT event_type, user_id % 2 AS arm,
             CAST(count(*) AS HUGEINT) AS o
           FROM events GROUP BY 1, 2),
       g AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS k,
               sum(o) AS n, sum(o * o) AS oo
             FROM a GROUP BY 1)
       SELECT event_type, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
              CAST(CASE WHEN n = 0 THEN NULL
                   ELSE (k * k * oo - k * n * n) * 1000000 // (n * k)
                   END AS BIGINT) AS chi2_micro
       FROM g"""

  /**
   * `decile_shift`: WHERE in the distribution did the cohorts diverge —
   * the exact nearest-rank value at every decile of the even- and
   * odd-user spend distributions per event type
   * ([[graft.ops.Sketches.exactPercentiles]] twice, joined), with the
   * per-decile delta: the drift DIAGNOSTIC beside `ks_drift`'s
   * one-number alarm (a KS rejection says it moved; this says the p90
   * moved 40 cents while the median held). Both percentile passes ride
   * the range-partition recipe.
   */
  def decileShift(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).where(col("value").isNotNull)
      .select(col("event_type"), cents(col("value")).as("cents"),
        (col("user_id") % 2 === 0).as("in_a"))
    val pcts = (10 to 90 by 10)
    // ONE stratified percentile pass with the cohort in the group key,
    // then pivot (round 20, same fusion as quantileTreatmentEffects): the
    // former two exactPercentiles passes + join paid two collapses, four
    // checkpoints and two range exchanges for bit-identical digits —
    // per-(event_type, cohort) cumulative counts never see the other
    // cohort, and the not-null filter is the inner join's
    // both-cohorts-present law.
    graft.ops.Sketches
      .exactPercentilesBy(ev, Seq("event_type", "in_a"), "cents", pcts)
      .groupBy(col("event_type"), col("pct"))
      .agg(max(when(col("in_a"), col("cents"))).as("cents_a"),
        max(when(!col("in_a"), col("cents"))).as("cents_b"))
      .where(col("cents_a").isNotNull && col("cents_b").isNotNull)
      .withColumn("delta", col("cents_a") - col("cents_b"))
  }

  val decileShiftSql: String =
    """WITH e AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents,
             user_id % 2 = 0 AS in_a
           FROM events WHERE value IS NOT NULL),
       r AS (SELECT event_type, in_a, cents,
               row_number() OVER (PARTITION BY event_type, in_a
                                  ORDER BY cents) AS rk,
               count(*) OVER (PARTITION BY event_type, in_a) AS n
             FROM e),
       p AS (SELECT unnest(generate_series(10, 90, 10)) AS pct),
       v AS (SELECT r.event_type, r.in_a, p.pct,
               max(CASE WHEN rk = (n * pct + 99) // 100 THEN cents END) AS v
             FROM r CROSS JOIN p GROUP BY 1, 2, 3)
       SELECT a.event_type, CAST(a.pct AS BIGINT) AS pct,
              a.v AS cents_a, b.v AS cents_b, a.v - b.v AS delta
       FROM v a JOIN v b ON a.event_type = b.event_type AND a.pct = b.pct
         AND a.in_a AND NOT b.in_a"""

  /**
   * `experiment_readout`: the END-TO-END experiment analysis in one
   * frame per event type — the order an experimentation platform
   * actually runs: (1) the [[graft.ops.Stats.srmCheck]] guardrail on the
   * arm split (believe nothing downstream if it fires), (2) the
   * [[graft.ops.Stats.chiSquare2x2]] conversion readout (cells, lift,
   * significance), (3) the [[graft.ops.Stats.cupedAdjust]]
   * variance-reduced spend means with the adjusted lift. Three
   * group-frame joins of three already-verified components — the same
   * composition story as `entity_resolution` for the experimentation
   * suite; every digit replays because each leg already does.
   */
  def experimentReadout(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir)
    val srm = graft.ops.Stats.srmCheck(
      ev.select(col("event_type"), (col("user_id") % 2).cast("long").as("arm")),
      Seq("event_type"), "arm")
      .select(col("event_type"), col("n"), col("chi2_micro").as("srm_chi2_micro"))
    val ab = graft.ops.Stats.chiSquare2x2(
      ev.withColumn("exposure", col("user_id") % 2 === 0)
        .withColumn("outcome", col("value") > 50),
      Seq("event_type"), "exposure", "outcome")
      .select(col("event_type"), col("lift_ppm"),
        col("chi2_micro").as("ab_chi2_micro"))
    val cut = to_timestamp(lit("2024-01-16"))
    val perUser = ev.where(col("value").isNotNull)
      .groupBy(col("event_type"), col("user_id"))
      .agg(
        coalesce(sum(when(col("ts") < cut, cents(col("value")))), lit(0L))
          .as("x_cents"),
        coalesce(sum(when(col("ts") >= cut, cents(col("value")))), lit(0L))
          .as("y_cents"))
      .withColumn("arm", (col("user_id") % 2).cast("long"))
    val cuped = graft.ops.Stats.cupedAdjust(perUser, Seq("event_type"), "arm",
      "y_cents", "x_cents")
    val adjLift = cuped.groupBy(col("event_type"))
      .agg((max(when(col("arm") === 0, col("adj_mean_y_micro")))
        - max(when(col("arm") === 1, col("adj_mean_y_micro"))))
        .as("adj_lift_micro"))
    srm.join(ab, Seq("event_type")).join(adjLift, Seq("event_type"))
  }

  val experimentReadoutSql: String =
    """WITH srm0 AS (
         SELECT event_type, CAST(count(*) AS HUGEINT) AS k,
                sum(o) AS n, sum(o * o) AS oo
         FROM (SELECT event_type, user_id % 2 AS arm,
                 CAST(count(*) AS HUGEINT) AS o
               FROM events GROUP BY 1, 2)
         GROUP BY 1),
       srm AS (
         SELECT event_type, CAST(n AS BIGINT) AS n,
                CAST((k * k * oo - k * n * n) * 1000000 // (n * k)
                     AS BIGINT) AS srm_chi2_micro
         FROM srm0),
       cells AS (
         SELECT event_type,
           CAST(sum(CASE WHEN user_id % 2 = 0 AND value > 50 THEN 1 ELSE 0 END) AS HUGEINT) AS a,
           CAST(sum(CASE WHEN user_id % 2 = 0 AND NOT (value > 50) THEN 1 ELSE 0 END) AS HUGEINT) AS b,
           CAST(sum(CASE WHEN NOT (user_id % 2 = 0) AND value > 50 THEN 1 ELSE 0 END) AS HUGEINT) AS c,
           CAST(sum(CASE WHEN NOT (user_id % 2 = 0) AND NOT (value > 50) THEN 1 ELSE 0 END) AS HUGEINT) AS d
         FROM events GROUP BY event_type),
       ab AS (
         SELECT event_type,
           CAST(CASE WHEN a + b = 0 OR c + d = 0 THEN NULL
                ELSE a * 1000000 // (a + b) - c * 1000000 // (c + d)
                END AS BIGINT) AS lift_ppm,
           CAST(CASE WHEN a + b = 0 OR c + d = 0 OR a + c = 0 OR b + d = 0 THEN NULL
                ELSE ((a * d - b * c) * (a * d - b * c) * 1000 // ((a + b) * (c + d)))
                     * (a + b + c + d) * 1000 // ((a + c) * (b + d))
                END AS BIGINT) AS ab_chi2_micro
         FROM cells),
       u AS (SELECT event_type, user_id,
               CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                      THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS HUGEINT) AS x,
               CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                      THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS HUGEINT) AS y
             FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
       arms AS (
         SELECT event_type, CAST(user_id % 2 AS BIGINT) AS arm,
                CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
                sum(x * y) AS sxy, sum(x * x) AS sxx
         FROM u GROUP BY 1, 2),
       pooled AS (
         SELECT event_type, arm, n, sx, sy,
                sum(n) OVER w AS tn, sum(sx) OVER w AS tx, sum(sy) OVER w AS ty,
                sum(sxy) OVER w AS txy, sum(sxx) OVER w AS txx
         FROM arms WINDOW w AS (PARTITION BY event_type)),
       adj AS (
         SELECT event_type, arm,
           CASE WHEN tn * txx - tx * tx = 0 THEN sy * 1000000 // n
                ELSE sy * 1000000 // n
                     - ((tn * txy - tx * ty) * 1000000 // (tn * txx - tx * tx))
                       * (sx * 1000000 // n - tx * 1000000 // tn) // 1000000
                END AS adj_mean
         FROM pooled),
       lift AS (
         SELECT event_type,
                CAST(max(CASE WHEN arm = 0 THEN adj_mean END)
                     - max(CASE WHEN arm = 1 THEN adj_mean END)
                     AS BIGINT) AS adj_lift_micro
         FROM adj GROUP BY 1)
       SELECT s.event_type, s.n, s.srm_chi2_micro, ab.lift_ppm,
              ab.ab_chi2_micro, lift.adj_lift_micro
       FROM srm s JOIN ab ON s.event_type = ab.event_type
                  JOIN lift ON s.event_type = lift.event_type"""

  /**
   * `did_readout`: difference-in-differences effect estimate per event
   * type ([[graft.ops.Stats.diffInDiff]]) — treated = even user id,
   * post = the 2024-01-16 split, y = spend cents: the four cell means in
   * exact micro (one truncated division each) and the contrast that
   * cancels the control arm's time trend. ONE fused conditional-sum agg.
   */
  def didReadout(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(col("event_type"), cents(col("value")).as("cents"),
      (col("user_id") % 2 === 0).as("treated"),
      (col("ts") >= to_timestamp(lit("2024-01-16"))).as("post"))
    graft.ops.Stats.diffInDiff(ev, Seq("event_type"), col("treated"),
      col("post"), "cents")
  }

  val didReadoutSql: String =
    """WITH e AS (SELECT event_type, user_id % 2 = 0 AS t,
             ts >= TIMESTAMP '2024-01-16' AS p,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
           FROM events WHERE value IS NOT NULL),
       c AS (SELECT event_type,
               CAST(sum(CASE WHEN t AND NOT p THEN 1 ELSE 0 END) AS HUGEINT) AS nt0,
               CAST(sum(CASE WHEN t AND NOT p THEN cents ELSE 0 END) AS HUGEINT) AS st0,
               CAST(sum(CASE WHEN t AND p THEN 1 ELSE 0 END) AS HUGEINT) AS ntp,
               CAST(sum(CASE WHEN t AND p THEN cents ELSE 0 END) AS HUGEINT) AS stp,
               CAST(sum(CASE WHEN NOT t AND NOT p THEN 1 ELSE 0 END) AS HUGEINT) AS nc0,
               CAST(sum(CASE WHEN NOT t AND NOT p THEN cents ELSE 0 END) AS HUGEINT) AS sc0,
               CAST(sum(CASE WHEN NOT t AND p THEN 1 ELSE 0 END) AS HUGEINT) AS ncp,
               CAST(sum(CASE WHEN NOT t AND p THEN cents ELSE 0 END) AS HUGEINT) AS scp
             FROM e GROUP BY 1),
       m AS (SELECT event_type,
               CAST(nt0 AS BIGINT) AS n_treated_pre,
               CAST(ntp AS BIGINT) AS n_treated_post,
               CAST(nc0 AS BIGINT) AS n_control_pre,
               CAST(ncp AS BIGINT) AS n_control_post,
               CAST(CASE WHEN nt0 = 0 THEN NULL
                    ELSE st0 * 1000000 // nt0 END AS BIGINT) AS mean_t0_micro,
               CAST(CASE WHEN ntp = 0 THEN NULL
                    ELSE stp * 1000000 // ntp END AS BIGINT) AS mean_tp_micro,
               CAST(CASE WHEN nc0 = 0 THEN NULL
                    ELSE sc0 * 1000000 // nc0 END AS BIGINT) AS mean_c0_micro,
               CAST(CASE WHEN ncp = 0 THEN NULL
                    ELSE scp * 1000000 // ncp END AS BIGINT) AS mean_cp_micro
             FROM c)
       SELECT m.*, mean_tp_micro - mean_t0_micro
                   - (mean_cp_micro - mean_c0_micro) AS did_micro
       FROM m"""

  /**
   * `mantel_haenszel`: day-stratified pooled conversion readout per event
   * type ([[graft.ops.Stats.mantelHaenszel]]) — exposure = even user id,
   * outcome = value > 50, strata = calendar day. The Simpson's-paradox-
   * proof companion to `experiment_readout`'s pooled 2×2: the MH common
   * odds ratio pools WITHIN-day comparisons (truncated milli terms, one
   * final division) and the CMH chi-squared reads significance off the
   * same cells; day-confounded traffic mix can no longer fake or mask a
   * lift. Cells are (type, day)-sized; everything after is a finish.
   */
  def mantelHaenszelQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir)
      .where(col("value").isNotNull && col("user_id").isNotNull)
      .select(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000").as("stratum"),
        (col("user_id") % 2 === 0).as("x"), (col("value") > 50).as("o"))
    graft.ops.Stats.mantelHaenszel(ev, Seq("event_type"), "stratum", "x", "o")
  }

  val mantelHaenszelSql: String =
    """WITH e AS (
         SELECT event_type, epoch_us(ts) // 86400000000 AS stratum,
                user_id % 2 = 0 AS x, value > 50 AS o
         FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
       cells AS (
         SELECT event_type, stratum,
           CAST(sum(CASE WHEN x AND o THEN 1 ELSE 0 END) AS HUGEINT) AS a,
           CAST(sum(CASE WHEN x AND NOT o THEN 1 ELSE 0 END) AS HUGEINT) AS b,
           CAST(sum(CASE WHEN NOT x AND o THEN 1 ELSE 0 END) AS HUGEINT) AS c,
           CAST(sum(CASE WHEN NOT x AND NOT o THEN 1 ELSE 0 END) AS HUGEINT) AS d
         FROM e GROUP BY 1, 2),
       m AS (
         SELECT event_type, a, b, c, d,
                a + b + c + d AS n, a + b AS m1, c + d AS m2,
                a + c AS m3, b + d AS m4,
                (a + b + c + d >= 2 AND a + b > 0 AND c + d > 0
                 AND a + c > 0 AND b + d > 0) AS ok
         FROM cells),
       g AS (
         SELECT event_type, count(*) AS n_strata, sum(n) AS n,
           sum(CASE WHEN n = 0 THEN 0 ELSE a * d * 1000 // n END) AS r,
           sum(CASE WHEN n = 0 THEN 0 ELSE b * c * 1000 // n END) AS s,
           sum(CASE WHEN ok THEN a * 1000 - m1 * m3 * 1000 // n
                    ELSE 0 END) AS dev,
           sum(CASE WHEN ok THEN (m1 * m2 * 1000 // n)
                    * (m3 * m4 * 1000 // n) // (n - 1)
                    ELSE 0 END) AS var
         FROM m GROUP BY 1)
       SELECT event_type, CAST(n_strata AS BIGINT) AS n_strata,
              CAST(n AS BIGINT) AS n,
              CAST(CASE WHEN s = 0 THEN NULL
                   ELSE r * 1000000 // s END AS BIGINT) AS or_mh_ppm,
              CAST(CASE WHEN var = 0 THEN NULL
                   ELSE dev * dev * 1000000 // var END AS BIGINT) AS cmh_chi2_micro
       FROM g"""

  /**
   * `kaplan_meier`: censoring-aware user-retention survival curve per
   * cohort ([[graft.ops.Stats.kaplanMeier]]) — duration = hours between a
   * user's first and last event, churn observed only when the last event
   * predates the 2024-01-25 horizon (later users are CENSORED: they
   * leave the risk set without moving the curve — the distinction a
   * naive alive-fraction gets wrong). Each step is ONE truncated
   * `S·(n−d) DIV n`; the oracle's recursive CTE replays the whole
   * product sequence digit-for-digit.
   */
  def kaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val perUser = events(dir).groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .select((col("user_id") % 3).cast("long").as("cohort"),
        expr("(unix_micros(CAST(last_ts AS TIMESTAMP)) - " +
          "unix_micros(CAST(first_ts AS TIMESTAMP))) DIV 3600000000").as("hours"),
        (col("last_ts") < to_timestamp(lit("2024-01-25"))).as("churned"))
    graft.ops.Stats.kaplanMeier(perUser, Seq("cohort"), "hours", col("churned"))
  }

  val kaplanMeierSql: String =
    """WITH RECURSIVE u AS (
         SELECT user_id, min(ts) AS f, max(ts) AS l FROM events GROUP BY 1),
       pu AS (SELECT CAST(user_id % 3 AS BIGINT) AS cohort,
                (epoch_us(l) - epoch_us(f)) // 3600000000 AS hours,
                l < TIMESTAMP '2024-01-25' AS churned
              FROM u),
       counts AS (SELECT cohort, hours,
                    CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS HUGEINT) AS d,
                    CAST(sum(CASE WHEN NOT churned THEN 1 ELSE 0 END) AS HUGEINT) AS c
                  FROM pu GROUP BY 1, 2),
       ord AS (SELECT cohort, hours, d, c,
                 row_number() OVER (PARTITION BY cohort ORDER BY hours) AS rk
               FROM counts),
       tot AS (SELECT cohort, sum(d + c) AS n FROM counts GROUP BY 1),
       rec AS (
         SELECT o.cohort, o.rk, o.hours, o.d, o.c, t.n AS n_risk,
                CASE WHEN o.d > 0 THEN CAST(1000000 AS HUGEINT) * (t.n - o.d) // t.n
                     ELSE CAST(1000000 AS HUGEINT) END AS surv,
                t.n - o.d - o.c AS nxt
         FROM ord o JOIN tot t ON o.cohort = t.cohort WHERE o.rk = 1
         UNION ALL
         SELECT o.cohort, o.rk, o.hours, o.d, o.c, r.nxt AS n_risk,
                CASE WHEN o.d > 0 THEN r.surv * (r.nxt - o.d) // r.nxt
                     ELSE r.surv END AS surv,
                r.nxt - o.d - o.c AS nxt
         FROM rec r JOIN ord o ON o.cohort = r.cohort AND o.rk = r.rk + 1)
       SELECT cohort, hours, CAST(n_risk AS BIGINT) AS n_risk,
              CAST(d AS BIGINT) AS d, CAST(c AS BIGINT) AS c,
              CAST(surv AS BIGINT) AS surv_ppm
       FROM rec"""

  /**
   * `gini_concentration`: Gini + Herfindahl concentration of customer
   * spend per nation ([[graft.ops.Stats.giniConcentration]]) — "how
   * top-heavy is each market": the Lorenz-rank identity with ranks on
   * the range-partition recipe and the one-division HHI; every digit
   * replays against the oracle's window-rank formulation.
   */
  def giniConcentration(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val perCust = t(dir, "orders")
      .join(t(dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("spend_cents"))
    graft.ops.Stats.giniConcentration(perCust, Seq("n_name"),
      "spend_cents", "c_custkey")
  }

  val giniConcentrationSql: String =
    s"""WITH pc AS (
         SELECT n_name, c_custkey,
                CAST(sum(${sqlCents("o_totalprice")}) AS HUGEINT) AS spend
         FROM orders JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1, 2),
       r AS (SELECT n_name, spend,
               row_number() OVER (PARTITION BY n_name
                                  ORDER BY spend, c_custkey) AS rk
             FROM pc),
       agg AS (SELECT n_name, CAST(count(*) AS HUGEINT) AS n,
                 sum(spend) AS sx, sum(spend * spend) AS sxx,
                 sum(CAST(rk AS HUGEINT) * spend) AS srx
               FROM r GROUP BY 1)
       SELECT n_name, CAST(n AS BIGINT) AS n, CAST(sx AS BIGINT) AS sum_v,
              CAST(CASE WHEN sx = 0 THEN NULL
                   ELSE (2 * srx - (n + 1) * sx) * 1000000 // (n * sx)
                   END AS BIGINT) AS gini_ppm,
              CAST(CASE WHEN sx = 0 THEN NULL
                   ELSE sxx * 1000000 // (sx * sx) END AS BIGINT) AS hhi_ppm
       FROM agg"""

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
  /**
   * `host_components`: EXACT connected components of the undirected host
   * graph ([[graft.ops.Graphs.connectedComponents]] — min-label
   * propagation with pointer jumping, run to the true fixpoint), every
   * host labeled with the smallest host id it can reach. The oracle is a
   * DuckDB recursive CTE computing min-reachable-id directly — fixpoint
   * vs fixpoint, so the hash match proves the iterate+compress loop
   * lands on the true components, not an iteration-count artifact.
   */
  def hostComponents(spark: SparkSession, dir: String): DataFrame = {
    graft.ops.Graphs.connectedComponents(linkHostEdges(spark, dir))
      .select(col("id").as("host"), col("component"))
  }

  val hostComponentsSql: String =
    s"""WITH RECURSIVE $sqlHostEdgesCtes,
       und AS (SELECT src AS u, dst AS v FROM edges
               UNION SELECT dst, src FROM edges),
       reach(id, lbl) AS (
         SELECT u, u FROM und
         UNION
         SELECT e.v, r.lbl FROM reach r JOIN und e ON e.u = r.id)
       SELECT id AS host, min(lbl) AS component FROM reach GROUP BY 1"""

  /**
   * `lang_source_assoc`: [[graft.ops.Stats.cramersV]] — k×k chi-squared
   * association between `source` and `lang` over the documents (does the
   * source determine the language mix?), with Cramér's V² in ppm via the
   * observed-cell identity `χ² = n·(Σ o²/(r·c) − 1)` — one truncated
   * division per cell, the absent-cell mass folded into the exact `−n`
   * term. Oracle replays the cell frame, every per-cell division and the
   * clamp in HUGEINT.
   */
  def langSourceAssoc(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.Stats.cramersV(t(dir, "documents"), Seq.empty, "source", "lang")
  }

  val langSourceAssocSql: String =
    """WITH cells AS (
         SELECT source, lang, CAST(count(*) AS HUGEINT) AS o FROM documents
         WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2),
       marg AS (
         SELECT source, lang, o,
                sum(o) OVER (PARTITION BY source) AS r,
                sum(o) OVER (PARTITION BY lang) AS c,
                sum(o) OVER () AS n FROM cells),
       terms AS (
         SELECT o, r, c, n, o * o * n * 1000000 // (r * c) AS term FROM marg),
       fin AS (
         SELECT max(n) AS n,
                (SELECT count(DISTINCT source) FROM cells) AS r,
                (SELECT count(DISTINCT lang) FROM cells) AS c,
                greatest(0, sum(term) - max(n) * 1000000) AS chi2
         FROM terms)
       SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
              CAST(CASE WHEN r >= 2 AND c >= 2 THEN chi2 END AS BIGINT) AS chi2_micro,
              CAST(CASE WHEN r >= 2 AND c >= 2
                   THEN chi2 // (n * least(r - 1, c - 1)) END AS BIGINT) AS v2_ppm
       FROM fin"""

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
   * `ks_drift`: exact two-sample Kolmogorov–Smirnov distance per event
   * type ([[graft.ops.Drift.ksTest]]) between the even- and odd-user
   * halves of the value distribution (cents) — the deterministic stand-in
   * for a before/after snapshot split. Cross-multiplied integer D with
   * ONE truncated division; the oracle replays the pooled-ECDF maximum
   * digit-for-digit.
   */
  /**
   * `rank_normalize`: [[graft.ops.Stats.rankNormalize]] — per-event-type
   * mid-rank quantiles of the cent values under the `(cents, event_id)`
   * total order, rolled up to decile counts (the compact proof that the
   * whole quantile axis is exercised: every rank in every group lands
   * in exactly the decile the oracle's window rank says). The ranks ride
   * the range-partition recipe, never a one-reducer group window.
   */
  def rankNormalize(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(col("event_type"), cents(col("value")).as("cents"),
      col("event_id"))
    graft.ops.Stats.rankNormalize(ev, Seq("event_type"), "cents", "event_id")
      .groupBy(col("event_type"), expr("q_ppm DIV 100000").as("decile"))
      .agg(count(lit(1)).as("n"))
  }

  /**
   * `winsorize`: [[graft.ops.Stats.winsorize]] — per-event-type clamp of
   * the cent values into the exact nearest-rank [p5, p95] caps, rolled to
   * per-type `(n, sum_w, n_lo, n_hi)`: the clipped SUM only matches if
   * every row clamped to exactly the oracle's caps, and the clip counts
   * pin both tails. Caps ride the range-partition percentile recipe; the
   * transform is a broadcast caps join + per-row least/greatest — rows
   * never shuffle for the clamp itself.
   */
  def winsorizeQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(col("event_type"), cents(col("value")).as("cents"))
    graft.ops.Stats.winsorize(ev, "event_type", "cents", 5, 95, "w")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("w")).as("sum_w"),
        sum(when(col("clipped_lo"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("clipped_hi"), 1L).otherwise(0L)).as("n_hi"))
  }

  val winsorizeSql: String =
    """WITH e AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
                  FROM events),
       v AS (SELECT event_type, cents FROM e WHERE cents IS NOT NULL),
       cnt AS (SELECT event_type, count(*) AS nn FROM v GROUP BY 1),
       r AS (SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rk
             FROM v),
       caps AS (SELECT c.event_type,
                  max(CASE WHEN rk = (nn * 5 + 99) // 100 THEN cents END) AS lo,
                  max(CASE WHEN rk = (nn * 95 + 99) // 100 THEN cents END) AS hi
                FROM cnt c JOIN r ON r.event_type = c.event_type GROUP BY 1)
       SELECT e.event_type, count(*) AS n,
              CAST(sum(CASE WHEN e.cents IS NULL THEN NULL
                   ELSE least(greatest(e.cents, caps.lo), caps.hi) END) AS BIGINT) AS sum_w,
              CAST(sum(CASE WHEN e.cents < caps.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
              CAST(sum(CASE WHEN e.cents > caps.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
       FROM e JOIN caps ON e.event_type = caps.event_type
       GROUP BY e.event_type"""

  val rankNormalizeSql: String =
    """WITH e AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents,
                  event_id FROM events WHERE value IS NOT NULL),
       r AS (SELECT event_type,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cents, event_id) AS rk,
               count(*) OVER (PARTITION BY event_type) AS n
             FROM e)
       SELECT event_type, (2 * rk - 1) * 1000000 // (2 * n) // 100000 AS decile,
              count(*) AS n
       FROM r GROUP BY 1, 2"""

  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(col("event_type"), cents(col("value")).as("cents"),
      (col("user_id") % 2 === 0).as("in_a"))
    graft.ops.Drift.ksTest(ev, Seq("event_type"), "cents", col("in_a"))
  }

  val ksDriftSql: String =
    """WITH e AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents,
                  user_id % 2 = 0 AS in_a FROM events WHERE value IS NOT NULL),
       c AS (SELECT event_type, cents,
               CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS HUGEINT) AS ca,
               CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS HUGEINT) AS cb
             FROM e GROUP BY 1, 2),
       cum AS (SELECT event_type, cents,
                sum(ca) OVER (PARTITION BY event_type ORDER BY cents) AS cuma,
                sum(cb) OVER (PARTITION BY event_type ORDER BY cents) AS cumb,
                sum(ca) OVER (PARTITION BY event_type) AS na,
                sum(cb) OVER (PARTITION BY event_type) AS nb
              FROM c)
       SELECT event_type, CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
              CAST(CASE WHEN max(na) = 0 OR max(nb) = 0 THEN NULL
                   ELSE max(abs(cuma * nb - cumb * na)) * 1000000 // (max(na) * max(nb))
                   END AS BIGINT) AS d_ppm
       FROM cum GROUP BY 1"""

  /**
   * `mw_drift`: exact Mann–Whitney U per event type
   * ([[graft.ops.Drift.mannWhitney]]) on the same even/odd-user value
   * split — tie-corrected DOUBLED midranks so `u2 = 2*U_A` and the AUC
   * effect size are pure integer functions of the data; the oracle
   * replays the midrank sum and both truncated divisions in HUGEINT.
   */
  def mwDrift(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(col("event_type"), cents(col("value")).as("cents"),
      (col("user_id") % 2 === 0).as("in_a"))
    graft.ops.Drift.mannWhitney(ev, Seq("event_type"), "cents", col("in_a"))
  }

  val mwDriftSql: String =
    """WITH e AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents,
                  user_id % 2 = 0 AS in_a FROM events WHERE value IS NOT NULL),
       c AS (SELECT event_type, cents,
               CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS HUGEINT) AS ca,
               CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS HUGEINT) AS cb
             FROM e GROUP BY 1, 2),
       cum AS (SELECT event_type, cents, ca, cb,
                sum(ca + cb) OVER (PARTITION BY event_type ORDER BY cents) - ca - cb AS bef,
                sum(ca) OVER (PARTITION BY event_type) AS na,
                sum(cb) OVER (PARTITION BY event_type) AS nb
              FROM c),
       agg AS (SELECT event_type, max(na) AS na, max(nb) AS nb,
                 sum(ca * (2 * bef + ca + cb + 1)) AS r2a
               FROM cum GROUP BY 1)
       SELECT event_type, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
              CAST(CASE WHEN na = 0 OR nb = 0 THEN NULL
                   ELSE r2a - na * (na + 1) END AS BIGINT) AS u2,
              CAST(CASE WHEN na = 0 OR nb = 0 THEN NULL
                   ELSE (r2a - na * (na + 1)) * 1000000 // (2 * na * nb)
                   END AS BIGINT) AS auc_ppm
       FROM agg"""

  /**
   * `category_drift`: k×2 chi-squared homogeneity of the event-type mix
   * ([[graft.ops.Drift.chiSquareKx2]]) between the even- and odd-user
   * cohorts, grouped by `user_id % 3` — "did the behavioral mix shift
   * between slices?". The staged truncated statistic
   * `(D² * 1e3 DIV (Na*Nb)) * 1e3 DIV t` replays digit-for-digit in
   * HUGEINT.
   */
  def categoryDrift(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select((col("user_id") % 3).cast("long").as("cohort"),
      col("event_type"), (col("user_id") % 2 === 0).as("in_a"))
    graft.ops.Drift.chiSquareKx2(ev, Seq("cohort"), "event_type", col("in_a"))
  }

  val categoryDriftSql: String =
    """WITH cells AS (
         SELECT CAST(user_id % 3 AS BIGINT) AS cohort, event_type,
           CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS a,
           CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS HUGEINT) AS b
         FROM events GROUP BY 1, 2),
       tot AS (SELECT cohort, event_type, a, b,
                 sum(a) OVER (PARTITION BY cohort) AS na,
                 sum(b) OVER (PARTITION BY cohort) AS nb
               FROM cells),
       terms AS (SELECT cohort, na, nb, a + b AS t,
                   CASE WHEN na = 0 OR nb = 0 THEN NULL WHEN a + b = 0 THEN 0
                        ELSE ((a * nb - b * na) * (a * nb - b * na) * 1000 // (na * nb))
                             * 1000 // (a + b) END AS term
                 FROM tot)
       SELECT cohort, CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
              CAST(sum(CASE WHEN t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS k,
              CAST(sum(term) AS BIGINT) AS chi2_micro
       FROM terms GROUP BY 1"""

  /**
   * `tv_drift`: total-variation distance (ppm) of the event-type mix
   * ([[graft.ops.Drift.tvDrift]]) between the even- and odd-user cohorts
   * on the same `user_id % 3` grouping as `category_drift` — the
   * bounded-[0, 1e6] effect size beside the χ² significance readout,
   * finishing from the SAME mergeable k×2 cells (so S23 streaming
   * windows re-aggregate into it too). Non-negative cross-multiplied
   * numerator + ONE truncated division replays digit-for-digit.
   */
  def tvDrift(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select((col("user_id") % 3).cast("long").as("cohort"),
      col("event_type"), (col("user_id") % 2 === 0).as("in_a"))
    graft.ops.Drift.tvDrift(ev, Seq("cohort"), "event_type", col("in_a"))
  }

  val tvDriftSql: String =
    """WITH cells AS (
         SELECT CAST(user_id % 3 AS BIGINT) AS cohort, event_type,
           CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS a,
           CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS HUGEINT) AS b
         FROM events GROUP BY 1, 2),
       tot AS (SELECT cohort, event_type, a, b,
                 sum(a) OVER (PARTITION BY cohort) AS na,
                 sum(b) OVER (PARTITION BY cohort) AS nb
               FROM cells)
       SELECT cohort, CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
              CAST(sum(CASE WHEN a + b > 0 THEN 1 ELSE 0 END) AS BIGINT) AS k,
              CAST(CASE WHEN max(na) = 0 OR max(nb) = 0 THEN NULL
                   ELSE sum(abs(a * nb - b * na)) * 1000000
                        // (2 * max(na) * max(nb)) END AS BIGINT) AS tv_ppm
       FROM tot GROUP BY 1"""

  /**
   * `spearman_corr`: exact Spearman rank correlation (ppm) per event type
   * ([[graft.ops.Stats.spearman]]) between value (cents) and event time
   * (epoch micros) — "does spend RANK drift over time?", the monotone
   * screen beside `ols_trend`'s linear one. Both rank passes are
   * `row_number` under the total orders `(cents, event_id)` /
   * `(us, event_id)` (the deterministic tie law), ridden on the
   * distributed range-rank recipe, so the oracle's one-window ranks
   * replay digit-for-digit; the closed form is one truncated division in
   * DECIMAL(38,0)/HUGEINT.
   */
  def spearmanCorr(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(col("event_type"), cents(col("value")).as("cents"),
      micros(col("ts")).as("us"), col("event_id"))
    graft.ops.Stats.spearman(ev, Seq("event_type"), "cents", "us", "event_id")
  }

  val spearmanCorrSql: String =
    """WITH e AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents,
                  epoch_us(ts) AS us, event_id
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
       r AS (SELECT event_type,
               CAST(row_number() OVER (
                 PARTITION BY event_type ORDER BY cents, event_id) AS HUGEINT) AS rx,
               CAST(row_number() OVER (
                 PARTITION BY event_type ORDER BY us, event_id) AS HUGEINT) AS ry
             FROM e),
       a AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
               sum((rx - ry) * (rx - ry)) AS sd2
             FROM r GROUP BY 1)
       SELECT event_type, CAST(n AS BIGINT) AS n,
              CAST(CASE WHEN n < 2 THEN NULL
                   ELSE 1000000 - sd2 * 6000000 // (n * (n * n - 1))
                   END AS BIGINT) AS rho_ppm
       FROM a"""

  /**
   * `label_agreement`: exact Cohen's kappa per event type
   * ([[graft.ops.Stats.cohenKappa]]) between two deterministic value-tier
   * "raters" with shifted cut points — the chance-corrected
   * label-agreement audit (two classifier versions, human-vs-model
   * labels). The single-division form `(n·agree − S)·1e6 DIV (n² − S)`
   * replays digit-for-digit in HUGEINT.
   */
  def labelAgreement(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    def tier(lo: Long, hi: Long) =
      when(col("cents") < lo, "low").when(col("cents") < hi, "mid").otherwise("high")
    val ev = events(dir).where(col("value").isNotNull)
      .select(col("event_type"), cents(col("value")).as("cents"))
      .select(col("event_type"), tier(2000, 6000).as("ra"), tier(2500, 5500).as("rb"))
    graft.ops.Stats.cohenKappa(ev, Seq("event_type"), "ra", "rb")
  }

  val labelAgreementSql: String =
    """WITH e AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
                  FROM events WHERE value IS NOT NULL),
       r AS (SELECT event_type,
               CASE WHEN cents < 2000 THEN 'low' WHEN cents < 6000 THEN 'mid'
                    ELSE 'high' END AS a,
               CASE WHEN cents < 2500 THEN 'low' WHEN cents < 5500 THEN 'mid'
                    ELSE 'high' END AS b
             FROM e),
       agg AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS HUGEINT) AS agree
               FROM r GROUP BY 1),
       na AS (SELECT event_type, a AS label, CAST(count(*) AS HUGEINT) AS na
              FROM r GROUP BY 1, 2),
       nb AS (SELECT event_type, b AS label, CAST(count(*) AS HUGEINT) AS nb
              FROM r GROUP BY 1, 2),
       s AS (SELECT event_type, sum(na * nb) AS s
             FROM na JOIN nb USING (event_type, label) GROUP BY 1)
       SELECT event_type, CAST(n AS BIGINT) AS n,
              CAST(agree * 1000000 // n AS BIGINT) AS po_ppm,
              CAST(s * 1000000 // (n * n) AS BIGINT) AS pe_ppm,
              CAST(CASE WHEN n * n = s THEN NULL
                   ELSE (n * agree - s) * 1000000 // (n * n - s)
                   END AS BIGINT) AS kappa_ppm
       FROM agg JOIN s USING (event_type)"""

  /** Shared Spark frame for the two calibration queries: spend cents as a
    * [0, 1e6] "confidence" score, a user-keyed boolean as the outcome. */
  private def calibrationInput(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    events(dir).where(col("value").isNotNull)
      .select(col("event_type"),
        least(cents(col("value")), lit(1000000L)).as("score_ppm"),
        (col("user_id") % 3 === 0).as("good"))
  }

  /** Shared DuckDB CTEs replaying [[calibrationInput]] + the bin rows. */
  private val sqlCalibrationCells: String =
    """e AS (SELECT event_type,
             least(CAST(round(value * 100, 0) AS BIGINT), 1000000) AS score,
             user_id % 3 = 0 AS good
           FROM events WHERE value IS NOT NULL),
       c AS (SELECT event_type,
               CAST(least(greatest(score * 10 // 1000000, 0), 9) AS BIGINT) AS bin,
               count(*) AS n,
               CAST(sum(CAST(score AS HUGEINT)) // count(*) AS BIGINT) AS mean_score_ppm,
               CAST(CAST(sum(CASE WHEN good THEN 1 ELSE 0 END) AS HUGEINT) * 1000000
                    // count(*) AS BIGINT) AS pos_rate_ppm
             FROM e GROUP BY 1, 2)"""

  /**
   * `pr_curve`: exact precision/recall/F1 at EVERY observed score
   * threshold per event type ([[graft.ops.Stats.prSweep]]) on the
   * calibration fixture (clamped spend cents as the score, `user_id % 3`
   * as the label) — the operating-point sweep a quality-classifier gate
   * reads its cutoff off. Confusion counts come from the ranged
   * cumulative-count scaffold (no one-reducer score window); each rate
   * is ONE truncated division of non-negative integers.
   */
  def prCurve(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.prSweep(calibrationInput(spark, dir),
      Seq("event_type"), "score_ppm", col("good"))

  val prCurveSql: String =
    """WITH e AS (SELECT event_type,
             least(CAST(round(value * 100, 0) AS BIGINT), 1000000) AS score_ppm,
             user_id % 3 = 0 AS good
           FROM events WHERE value IS NOT NULL),
       c AS (SELECT event_type, score_ppm,
               CAST(sum(CASE WHEN good THEN 1 ELSE 0 END) AS HUGEINT) AS ca,
               CAST(sum(CASE WHEN NOT good THEN 1 ELSE 0 END) AS HUGEINT) AS cb
             FROM e GROUP BY 1, 2),
       cum AS (SELECT event_type, score_ppm, ca, cb,
                sum(ca) OVER (PARTITION BY event_type ORDER BY score_ppm) AS cuma,
                sum(cb) OVER (PARTITION BY event_type ORDER BY score_ppm) AS cumb,
                sum(ca) OVER (PARTITION BY event_type) AS na,
                sum(cb) OVER (PARTITION BY event_type) AS nb
              FROM c),
       k AS (SELECT event_type, score_ppm, na, nb,
               na - cuma + ca AS tp, nb - cumb + cb AS fp, cuma - ca AS fn
             FROM cum)
       SELECT event_type, score_ppm,
              CAST(na AS BIGINT) AS n_pos, CAST(nb AS BIGINT) AS n_neg,
              CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
              CAST(fn AS BIGINT) AS fn,
              CAST(CASE WHEN tp + fp = 0 THEN NULL
                   ELSE tp * 1000000 // (tp + fp) END AS BIGINT) AS precision_ppm,
              CAST(CASE WHEN na = 0 THEN NULL
                   ELSE tp * 1000000 // na END AS BIGINT) AS recall_ppm,
              CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
                   ELSE tp * 2000000 // (2 * tp + fp + fn) END AS BIGINT) AS f1_ppm
       FROM k"""

  /**
   * `score_auc`: exact ROC-AUC (ppm) of the same score/label fixture per
   * event type via the rank-sum identity — [[graft.ops.Drift.mannWhitney]]
   * with the POSITIVE label as sample A: `auc_ppm` is the probability a
   * random positive outscores a random negative (ties half), the
   * one-number ranking-quality readout beside `pr_curve`'s sweep and
   * `calibration_ece`'s probability-quality gate. Doubled tie-corrected
   * midranks keep it a pure integer function of the data.
   */
  def scoreAuc(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Drift.mannWhitney(calibrationInput(spark, dir),
      Seq("event_type"), "score_ppm", col("good"))

  val scoreAucSql: String =
    """WITH e AS (SELECT event_type,
             least(CAST(round(value * 100, 0) AS BIGINT), 1000000) AS score_ppm,
             user_id % 3 = 0 AS good
           FROM events WHERE value IS NOT NULL),
       c AS (SELECT event_type, score_ppm,
               CAST(sum(CASE WHEN good THEN 1 ELSE 0 END) AS HUGEINT) AS ca,
               CAST(sum(CASE WHEN NOT good THEN 1 ELSE 0 END) AS HUGEINT) AS cb
             FROM e GROUP BY 1, 2),
       cum AS (SELECT event_type, score_ppm, ca, cb,
                sum(ca + cb) OVER (PARTITION BY event_type ORDER BY score_ppm)
                  - ca - cb AS bef,
                sum(ca) OVER (PARTITION BY event_type) AS na,
                sum(cb) OVER (PARTITION BY event_type) AS nb
              FROM c),
       agg AS (SELECT event_type, max(na) AS na, max(nb) AS nb,
                 sum(ca * (2 * bef + ca + cb + 1)) AS r2a
               FROM cum GROUP BY 1)
       SELECT event_type, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
              CAST(CASE WHEN na = 0 OR nb = 0 THEN NULL
                   ELSE r2a - na * (na + 1) END AS BIGINT) AS u2,
              CAST(CASE WHEN na = 0 OR nb = 0 THEN NULL
                   ELSE (r2a - na * (na + 1)) * 1000000 // (2 * na * nb)
                   END AS BIGINT) AS auc_ppm
       FROM agg"""

  /**
   * `brier_score`: the proper scoring rule on the calibration fixture
   * ([[graft.ops.Stats.brierScore]]) — exact ppm² squared errors summed
   * in DECIMAL(38,0), one truncated division back to micro; the
   * un-gameable companion to `calibration_ece`'s binned gap and
   * `score_auc`'s ranking quality.
   */
  def brierScoreQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.brierScore(calibrationInput(spark, dir),
      Seq("event_type"), "score_ppm", "good")

  val brierScoreSql: String =
    """WITH e AS (SELECT event_type,
             least(CAST(round(value * 100, 0) AS BIGINT), 1000000) AS score_ppm,
             user_id % 3 = 0 AS good
           FROM events WHERE value IS NOT NULL),
       g AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
               sum((CAST(score_ppm AS HUGEINT)
                    - CASE WHEN good THEN 1000000 ELSE 0 END)
                   * (CAST(score_ppm AS HUGEINT)
                    - CASE WHEN good THEN 1000000 ELSE 0 END)) AS se
             FROM e GROUP BY 1)
       SELECT event_type, CAST(n AS BIGINT) AS n,
              CAST(CASE WHEN n = 0 THEN NULL
                   ELSE se // (n * 1000000) END AS BIGINT) AS brier_micro
       FROM g"""

  /**
   * `score_calibration`: reliability-diagram rows per event type
   * ([[graft.ops.Stats.calibrationBins]]) — spend cents clamped to the
   * ppm domain as a stand-in confidence score, fixed-width bins so
   * slices re-aggregate bin-for-bin; every truncated mean/rate replays.
   */
  def scoreCalibration(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.calibrationBins(calibrationInput(spark, dir),
      Seq("event_type"), "score_ppm", "good", bins = 10)

  val scoreCalibrationSql: String =
    s"""WITH $sqlCalibrationCells
       SELECT event_type, bin, n, mean_score_ppm, pos_rate_ppm FROM c"""

  /**
   * `calibration_ece`: the one-number finisher over the same bins
   * ([[graft.ops.Stats.eceFromBins]]) — bin-mass-weighted
   * |pos_rate − mean_score|, the gate a classifier-drift alarm watches.
   */
  def calibrationEce(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.eceFromBins(
      graft.ops.Stats.calibrationBins(calibrationInput(spark, dir),
        Seq("event_type"), "score_ppm", "good", bins = 10),
      Seq("event_type"))

  val calibrationEceSql: String =
    s"""WITH $sqlCalibrationCells
       SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
              CAST(CASE WHEN sum(n) = 0 THEN NULL
                   ELSE sum(CAST(n AS HUGEINT) * abs(pos_rate_ppm - mean_score_ppm))
                        // sum(n) END AS BIGINT) AS ece_ppm
       FROM c GROUP BY 1"""

  /**
   * `k_anonymity`: [[graft.ops.DataQuality.kAnonymity]] over the
   * (event_type, exact-cents) quasi-identifier pair — the
   * re-identifiability summary a release gate reads before shipping
   * (exact spend amounts are notorious quasi-identifiers). Null values
   * form a real class; every count and the one truncated ppm replay.
   */
  def kAnonymityQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.DataQuality.kAnonymity(
      events(dir).select(col("event_type"), cents(col("value")).as("cents")),
      Seq("event_type", "cents"), k = 5)
  }

  val kAnonymitySql: String =
    """WITH c AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents,
                  count(*) AS cnt
                FROM events GROUP BY 1, 2)
       SELECT CAST(sum(cnt) AS BIGINT) AS n, count(*) AS n_classes,
              min(cnt) AS min_class_size,
              CAST(sum(CASE WHEN cnt < 5 THEN 1 ELSE 0 END) AS BIGINT) AS violating_classes,
              CAST(sum(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS BIGINT) AS violating_rows,
              CAST(CAST(sum(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS HUGEINT) * 1000000
                   // sum(cnt) AS BIGINT) AS violating_rows_ppm
       FROM c"""

  /**
   * `l_diversity`: [[graft.ops.DataQuality.lDiversity]] per
   * (event_type, spend band) class with a user bucket as the sensitive
   * value — the uniform-class screen k-anonymity alone misses. The
   * oracle replays the two-level distinct collapse (null-safe, unlike a
   * bare `count(DISTINCT ...)`).
   */
  def lDiversityQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.DataQuality.lDiversity(
      events(dir).select(col("event_type"),
        expr("CAST(round(value * 100, 0) AS BIGINT) DIV 1000").as("band"),
        (col("user_id") % 7).as("bucket")),
      Seq("event_type", "band"), "bucket", l = 5)
  }

  val lDiversitySql: String =
    """WITH e AS (SELECT event_type,
                  CAST(round(value * 100, 0) AS BIGINT) // 1000 AS band,
                  user_id % 7 AS bucket FROM events),
       c AS (SELECT event_type, band, bucket, count(*) AS cnt
             FROM e GROUP BY 1, 2, 3)
       SELECT event_type, band, CAST(sum(cnt) AS BIGINT) AS class_size,
              count(*) AS n_sensitive, count(*) >= 5 AS diverse
       FROM c GROUP BY 1, 2"""

  /**
   * `fd_violations`: [[graft.ops.DataQuality.fdViolations]] for the
   * candidate rule source → lang — the g3 audit (minimum rows to delete
   * for the FD to hold). The modal pick's null-first-then-smallest tie
   * law replays as an explicit window order in the oracle.
   */
  def fdViolationsQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.DataQuality.fdViolations(t(dir, "documents"), "source", "lang")
  }

  val fdViolationsSql: String =
    """WITH c AS (SELECT source, lang, count(*) AS cnt FROM documents GROUP BY 1, 2),
       r AS (SELECT source, lang, cnt, row_number() OVER (
               PARTITION BY source
               ORDER BY cnt DESC, (lang IS NOT NULL), lang) AS rk FROM c),
       a AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n, count(*) AS n_dep,
               CAST(max(cnt) AS BIGINT) AS top_n FROM c GROUP BY 1)
       SELECT a.source, a.n, a.n_dep, r.lang AS top_dep,
              a.n - a.top_n AS violations,
              CAST(CAST(a.n - a.top_n AS HUGEINT) * 1000000 // a.n AS BIGINT)
                AS violation_ppm
       FROM a JOIN r ON a.source = r.source AND r.rk = 1"""

  /**
   * `fleiss_kappa`: [[graft.ops.Stats.fleissKappa]] per lang over a
   * balanced three-rater panel — three deterministic length-tier
   * "raters" with shifted cut points label every document, the
   * multi-rater generalization of `label_agreement`. Every subject has
   * exactly 3 ratings by construction (the oracle still replays the
   * balanced-panel exclusion); the single-division kappa replays
   * digit-for-digit in HUGEINT.
   */
  def fleissKappaQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    def tier(lo: Long, hi: Long) =
      when(col("n_chars") < lo, "low").when(col("n_chars") < hi, "mid")
        .otherwise("high")
    val ratings = t(dir, "documents").select(col("lang"), col("doc_id"),
      explode(array(tier(150, 350), tier(180, 320), tier(200, 300))).as("cat"))
    graft.ops.Stats.fleissKappa(ratings, Seq("lang"), "doc_id", "cat", 3)
  }

  val fleissKappaSql: String =
    """WITH r AS (
         SELECT lang, doc_id, CASE WHEN n_chars < 150 THEN 'low'
                WHEN n_chars < 350 THEN 'mid' ELSE 'high' END AS cat FROM documents
         UNION ALL
         SELECT lang, doc_id, CASE WHEN n_chars < 180 THEN 'low'
                WHEN n_chars < 320 THEN 'mid' ELSE 'high' END FROM documents
         UNION ALL
         SELECT lang, doc_id, CASE WHEN n_chars < 200 THEN 'low'
                WHEN n_chars < 300 THEN 'mid' ELSE 'high' END FROM documents),
       sc AS (SELECT lang, doc_id, cat, CAST(count(*) AS HUGEINT) AS cnt
              FROM r GROUP BY 1, 2, 3),
       subj AS (SELECT lang, doc_id, sum(cnt) AS tot, sum(cnt * (cnt - 1)) AS po
                FROM sc GROUP BY 1, 2),
       pg AS (SELECT lang,
                sum(CASE WHEN tot = 3 THEN 1 ELSE 0 END) AS nsub,
                sum(CASE WHEN tot <> 3 THEN 1 ELSE 0 END) AS nexc,
                sum(CASE WHEN tot = 3 THEN po ELSE 0 END) AS po_num
              FROM subj GROUP BY 1),
       ct AS (SELECT sc.lang, sc.cat, sum(sc.cnt) AS cj
              FROM sc JOIN subj ON sc.lang = subj.lang AND sc.doc_id = subj.doc_id
              WHERE subj.tot = 3 GROUP BY 1, 2),
       s AS (SELECT lang, sum(cj * cj) AS s FROM ct GROUP BY 1)
       SELECT pg.lang, CAST(nsub AS BIGINT) AS n_subjects,
              CAST(nexc AS BIGINT) AS n_excluded,
              CAST(CASE WHEN nsub = 0 THEN NULL
                   ELSE po_num * 1000000 // (nsub * 3 * 2) END AS BIGINT) AS po_ppm,
              CAST(CASE WHEN nsub = 0 THEN NULL
                   ELSE s.s * 1000000 // (nsub * 3 * nsub * 3) END AS BIGINT) AS pe_ppm,
              CAST(CASE WHEN nsub = 0 OR nsub * 3 * nsub * 3 = s.s THEN NULL
                   ELSE (po_num * nsub * 3 - 2 * s.s) * 1000000
                        // (2 * (nsub * 3 * nsub * 3 - s.s)) END AS BIGINT) AS kappa_ppm
       FROM pg LEFT JOIN s ON pg.lang = s.lang"""

  /**
   * `label_balance`: [[graft.ops.Stats.labelBalance]] — per-source class
   * balance of the language labels: `n`, distinct labels `k`, the
   * majority label and its ppm share, and the EXACT integer Gini
   * impurity `1e6 − Σc²·1e6 DIV n²` (0 = one class, uniform → 1e6·(1−1/k))
   * — the curation readout before training on a labeled slice (entropy
   * would need logs that never replay digit-for-digit; Gini is rational).
   * Majority ties break to the LARGEST label string (struct-max law, a
   * total order). Oracle replays counts, the argmax and both truncated
   * divisions.
   */
  def labelBalanceQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.Stats.labelBalance(t(dir, "documents"), Seq("source"), "lang")
  }

  val labelBalanceSql: String =
    """WITH c AS (SELECT source, lang, count(*) AS cnt FROM documents GROUP BY 1, 2),
       g AS (SELECT source,
               sum(CASE WHEN lang IS NOT NULL THEN cnt ELSE 0 END) AS n,
               sum(CASE WHEN lang IS NULL THEN cnt ELSE 0 END) AS n_null,
               count(CASE WHEN lang IS NOT NULL THEN 1 END) AS k,
               max(CASE WHEN lang IS NOT NULL THEN cnt END) AS maxc,
               sum(CASE WHEN lang IS NOT NULL THEN CAST(cnt AS HUGEINT) * cnt ELSE 0 END) AS ss
             FROM c GROUP BY 1),
       m AS (SELECT source, max(lang) AS majority FROM c
             WHERE lang IS NOT NULL
               AND cnt = (SELECT max(c2.cnt) FROM c c2
                          WHERE c2.source = c.source AND c2.lang IS NOT NULL)
             GROUP BY 1)
       SELECT g.source, CAST(n AS BIGINT) AS n, CAST(n_null AS BIGINT) AS n_null,
              k, m.majority,
              CAST(CASE WHEN n > 0 THEN maxc * 1000000 // n END AS BIGINT) AS majority_ppm,
              CAST(CASE WHEN n > 0 THEN 1000000 - ss * 1000000 // (CAST(n AS HUGEINT) * n) END AS BIGINT) AS gini_ppm
       FROM g LEFT JOIN m ON g.source = m.source"""

  /**
   * `link_prediction`: [[graft.ops.Graphs.linkPrediction]] over the
   * synthetic host graph — the top-100 non-adjacent host pairs by
   * common-neighbor count with exact Jaccard ppm and preferential
   * attachment, under the `(cn DESC, u, v)` total order. The oracle
   * replays the undirected dedup, the capped wedge join (the 1000-degree
   * cap never binds on the 250-host graph, but it is part of the
   * operator's definition so both sides apply it), the existing-edge
   * anti-join and the truncated Jaccard division.
   */
  def linkPredictionQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Graphs.linkPrediction(linkHostEdges(spark, dir))
      .orderBy(col("cn").desc, col("u"), col("v")).limit(100)

  val linkPredictionSql: String =
    s"""WITH $sqlHostEdgesCtes,
       und AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi FROM edges),
       adj AS (SELECT lo AS ctr, hi AS nbr FROM und UNION ALL SELECT hi, lo FROM und),
       deg AS (SELECT ctr AS id, count(*) AS degree FROM adj GROUP BY 1),
       ctrs AS (SELECT a.ctr, a.nbr FROM adj a JOIN deg d ON a.ctr = d.id AND d.degree <= 1000),
       cn AS (SELECT w1.nbr AS u, w2.nbr AS v, CAST(count(*) AS HUGEINT) AS cn
              FROM ctrs w1 JOIN ctrs w2 ON w1.ctr = w2.ctr AND w1.nbr < w2.nbr
              GROUP BY 1, 2),
       cand AS (SELECT cn.u, cn.v, cn.cn FROM cn
                LEFT JOIN und ON cn.u = und.lo AND cn.v = und.hi
                WHERE und.lo IS NULL)
       SELECT u, v, CAST(cn AS BIGINT) AS cn,
              CAST(du.degree AS BIGINT) AS deg_u, CAST(dv.degree AS BIGINT) AS deg_v,
              CAST(cn * 1000000 // (du.degree + dv.degree - cn) AS BIGINT) AS jaccard_ppm,
              CAST(du.degree * dv.degree AS BIGINT) AS pa
       FROM cand JOIN deg du ON cand.u = du.id JOIN deg dv ON cand.v = dv.id
       ORDER BY cn DESC, u, v LIMIT 100"""

  /**
   * `krippendorff_alpha`: [[graft.ops.Stats.krippendorffAlpha]] over an
   * UNBALANCED synthetic panel — every 5 consecutive doc_ids form one
   * rated unit, each document contributing its `lang` as one anonymous
   * rating (trailing units naturally have fewer ratings, the irregular
   * overlap shape Fleiss cannot score), grouped into three panels by
   * `unit % 3`. The oracle replays the per-unit staged truncated terms
   * and the single final division in HUGEINT.
   */
  def krippendorffAlphaQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ratings = t(dir, "documents").select(
      expr("doc_id DIV 5").as("unit"),
      expr("(doc_id DIV 5) % 3").as("panel"),
      col("lang"))
    graft.ops.Stats.krippendorffAlpha(ratings, Seq("panel"), "unit", "lang")
  }

  val krippendorffAlphaSql: String =
    """WITH r AS (SELECT doc_id // 5 AS unit, (doc_id // 5) % 3 AS panel, lang FROM documents),
       uc AS (SELECT panel, unit, lang, CAST(count(*) AS HUGEINT) AS k
              FROM r GROUP BY 1, 2, 3),
       u AS (SELECT panel, unit, sum(k) AS nu, sum(k * k) AS s2 FROM uc GROUP BY 1, 2),
       t AS (SELECT panel,
               sum(CASE WHEN nu >= 2 THEN (nu * nu - s2) * 1000000 // (nu - 1) ELSE 0 END) AS don,
               sum(CASE WHEN nu >= 2 THEN nu ELSE 0 END) AS n,
               sum(CASE WHEN nu >= 2 THEN 1 ELSE 0 END) AS n_units,
               sum(CASE WHEN nu < 2 THEN 1 ELSE 0 END) AS n_single
             FROM u GROUP BY 1),
       ct AS (SELECT uc.panel, uc.lang, sum(uc.k) AS cj
              FROM uc JOIN u ON uc.panel = u.panel AND uc.unit = u.unit
              WHERE u.nu >= 2 GROUP BY 1, 2),
       s AS (SELECT panel, sum(cj * cj) AS sc2 FROM ct GROUP BY 1)
       SELECT t.panel, CAST(n_units AS BIGINT) AS n_units,
              CAST(n_single AS BIGINT) AS n_single,
              CAST(n AS BIGINT) AS n_ratings,
              CAST(CASE WHEN n < 2 OR n * n = sc2 THEN NULL
                   ELSE 1000000 - ((n - 1) * don) // (n * n - sc2)
                   END AS BIGINT) AS alpha_ppm
       FROM t LEFT JOIN s ON t.panel = s.panel"""

  /**
   * `bh_select`: [[graft.ops.Stats.benjaminiHochberg]] over a
   * deterministic synthetic readout sheet — one "test" per document with
   * an md5-derived p-value (every 11th doc planted small, the signal the
   * step-up must find without admitting the uniform noise), grouped by
   * source at α = 0.05. The full decision sheet (rank, m, significant)
   * replays digit-for-digit: the md5 bucket, the `(p, id)` total-order
   * rank and the cross-multiplied step-up cutoff are all exact integers.
   */
  def bhSelectQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    // inline twin of TextAnalysis.hashBucket (private[ops]): first 16
    // md5 bits of "bh:<id>" — the library-wide sampling primitive
    val b = conv(substring(md5(concat(lit("bh:"), col("doc_id").cast("string"))), 1, 4),
      16, 10).cast("long")
    val tests = t(dir, "documents").select(col("source"), col("doc_id"),
      when(col("doc_id") % 11 === 0, b % 2000L + 1L)
        .otherwise((b * 16L) % 1000000L + 1L).cast("long").as("p_ppm"))
    graft.ops.Stats.benjaminiHochberg(tests, Seq("source"), "p_ppm", "doc_id",
      alphaPpm = 50000L)
  }

  val bhSelectSql: String = {
    val b = sqlHashBucket("doc_id", "bh")
    s"""WITH tests AS (
         SELECT source, doc_id,
                CAST(CASE WHEN doc_id % 11 = 0 THEN $b % 2000 + 1
                     ELSE ($b * 16) % 1000000 + 1 END AS BIGINT) AS p_ppm
         FROM documents),
       ranked AS (
         SELECT source, doc_id, p_ppm,
                row_number() OVER (PARTITION BY source ORDER BY p_ppm, doc_id) AS rank,
                count(*) OVER (PARTITION BY source) AS n_tests
         FROM tests),
       cut AS (
         SELECT source, max(rank) AS c FROM ranked
         WHERE CAST(p_ppm AS HUGEINT) * n_tests <= 50000 * CAST(rank AS HUGEINT)
         GROUP BY source)
       SELECT r.source, r.doc_id, r.p_ppm, CAST(r.rank AS BIGINT) AS rank,
              CAST(r.n_tests AS BIGINT) AS n_tests,
              r.rank <= coalesce(c.c, 0) AS significant
       FROM ranked r LEFT JOIN cut c ON r.source = c.source"""
  }

  /**
   * `feature_bins`: [[graft.ops.Stats.featureBins]] — per-source
   * equal-frequency length deciles of `n_chars` with the English rate per
   * bin, the "is document length predictive of language" feature screen.
   * The oracle replays the nearest-rank decile edges, the `value > edge`
   * counting-chain bin law and the truncated rate division.
   */
  def featureBinsQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.ops.Stats.featureBins(t(dir, "documents"), "source", "n_chars",
      col("lang") === "en", nBins = 10)
  }

  val featureBinsSql: String =
    """WITH d AS (SELECT source, n_chars AS f, lang = 'en' AS t
                  FROM documents WHERE n_chars IS NOT NULL),
       ranked AS (SELECT source, f,
                    row_number() OVER (PARTITION BY source ORDER BY f) AS rk,
                    count(*) OVER (PARTITION BY source) AS n
                  FROM d),
       edges AS (SELECT source, list_sort(list(f)) AS es
                 FROM ranked, (SELECT unnest([10, 20, 30, 40, 50, 60, 70, 80, 90]) AS p) ps
                 WHERE rk = (n * p + 99) // 100
                 GROUP BY source),
       binned AS (SELECT d.source,
                    CAST(len(list_filter(es, e -> d.f > e)) AS BIGINT) AS bin,
                    d.t
                  FROM d JOIN edges ON d.source = edges.source)
       SELECT source, bin, count(*) AS n,
              CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
              CAST(CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS HUGEINT) * 1000000
                   // count(*) AS BIGINT) AS pos_rate_ppm
       FROM binned GROUP BY 1, 2"""

  /**
   * `qte_readout`: [[graft.ops.Stats.quantileTreatmentEffects]] — the
   * distributional A/B readout on event cents per type (even/odd users as
   * arms): exact nearest-rank `Q_treat − Q_control` at p10/25/50/75/90,
   * the effect a mean lift hides when only a tail moves. Both percentile
   * passes and the join replay digit-for-digit.
   */
  def qteReadout(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(col("event_type"), cents(col("value")).as("cents"),
      (col("user_id") % 2 === 0).as("in_t"))
    graft.ops.Stats.quantileTreatmentEffects(ev, "event_type", "cents", col("in_t"))
  }

  val qteReadoutSql: String =
    """WITH e AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents,
                  user_id % 2 = 0 AS in_t
                FROM events WHERE value IS NOT NULL),
       r AS (SELECT event_type, in_t, cents,
               row_number() OVER (PARTITION BY event_type, in_t ORDER BY cents) AS rk,
               count(*) OVER (PARTITION BY event_type, in_t) AS n
             FROM e),
       q AS (SELECT event_type, in_t, p.pct, min(cents) AS v
             FROM r, (SELECT unnest([10, 25, 50, 75, 90]) AS pct) p
             WHERE rk = (n * p.pct + 99) // 100
             GROUP BY 1, 2, 3)
       SELECT t.event_type, CAST(t.pct AS BIGINT) AS pct,
              t.v AS treat, c.v AS control, t.v - c.v AS qte
       FROM q t JOIN q c ON t.event_type = c.event_type AND t.pct = c.pct
       WHERE t.in_t AND NOT c.in_t"""

  /**
   * `bootstrap_ci`: [[graft.ops.Stats.poissonBootstrapCI]] — the
   * deterministic Poisson-bootstrap 5–95 band on mean event cents per
   * type, 32 replicates drawn through the fixed λ=1 inverse-CDF table
   * from `md5(boot:id:rep)`. The one bootstrap an oracle can replay:
   * buckets, weights, truncated replicate means and the nearest-rank
   * band all hash-match digit-for-digit.
   */
  def bootstrapCiQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(col("event_type"), col("event_id"),
      cents(col("value")).as("cents"))
    graft.ops.Stats.poissonBootstrapCI(ev, "event_type", "event_id", "cents",
      b = 32, loPct = 5, hiPct = 95)
  }

  val bootstrapCiSql: String = {
    // the block law: md5('boot:' || id || ':' || rep // 8), 16-bit slice
    // at hex offset (rep % 8) * 4 — poissonWeightArray digit-for-digit
    def digit(i: Int) =
      s"(strpos('0123456789abcdef', substring(h, CAST((rep % 8) * 4 + $i AS INT), 1)) - 1)"
    val bucket = s"(((${digit(1)} * 16 + ${digit(2)}) * 16 + ${digit(3)}) * 16 + ${digit(4)})"
    val wTerms = graft.ops.Stats.PoissonCdf16
      .map(t => s"(CASE WHEN bk >= $t THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH e AS (SELECT event_type, event_id,
                  CAST(round(value * 100, 0) AS BIGINT) AS cents
                FROM events WHERE value IS NOT NULL),
       reps AS (SELECT event_type, event_id, cents, unnest(range(32)) AS rep FROM e),
       hs AS (SELECT event_type, rep, cents,
                md5('boot:' || event_id || ':' || (rep // 8)) AS h
              FROM reps),
       bks AS (SELECT event_type, rep, cents, $bucket AS bk FROM hs),
       wts AS (SELECT event_type, rep, cents, ($wTerms) AS w FROM bks),
       m AS (SELECT event_type, rep, CAST(sum(w) AS HUGEINT) AS nw,
               CAST(sum(w * cents) AS HUGEINT) AS s
             FROM wts GROUP BY 1, 2),
       means AS (SELECT event_type,
                   CAST(s * 1000000 // nw AS BIGINT) AS mean
                 FROM m WHERE nw > 0),
       ranked AS (SELECT event_type, mean,
                    row_number() OVER (PARTITION BY event_type ORDER BY mean) AS rk,
                    count(*) OVER (PARTITION BY event_type) AS nr
                  FROM means),
       ci AS (SELECT event_type,
                max(CASE WHEN rk = (nr * 5 + 99) // 100 THEN mean END) AS ci_lo_micro,
                max(CASE WHEN rk = (nr * 95 + 99) // 100 THEN mean END) AS ci_hi_micro
              FROM ranked GROUP BY 1),
       pt AS (SELECT event_type, count(*) AS n,
                CAST(CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) * 1000000
                     // count(*) AS BIGINT) AS mean_micro
              FROM e GROUP BY 1)
       SELECT pt.event_type, pt.n, pt.mean_micro, ci.ci_lo_micro, ci.ci_hi_micro
       FROM pt JOIN ci USING (event_type)"""
  }
}
