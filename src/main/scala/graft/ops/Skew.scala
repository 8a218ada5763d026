package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for hot keys. AQE's skew-join handles most cases at
 * runtime (Verify/Bench sessions enable it); these helpers cover the two
 * situations AQE cannot: a single key too hot for any split to help at the
 * reducer (salted two-phase aggregation), and a skewed shuffle join where
 * the small side is still too large to broadcast (salted replicate join).
 */
object Skew {

  /**
   * A cheap salt in [0, n): spreads a hot key across n reducers. Built on
   * `monotonically_increasing_id()`, so it is PARTITION-DEPENDENT — a task
   * retry or an AQE replan can re-salt the same row differently. Harmless
   * for pure load-spreading aggregation (any assignment balances equally);
   * for runs that must be reproducible row-for-row, use [[saltBy]] keyed on
   * stable row content instead.
   */
  def salt(n: Int): Column = pmod(hash(monotonically_increasing_id()), lit(n))

  /**
   * Deterministic salt in [0, n): a pure function of the given row columns,
   * so retries, AQE replans, and re-runs always assign a row the same salt.
   * Key it on a stable row id (or the full row's identifying columns), NOT
   * on the hot grouping key itself — salting by the group key alone maps
   * each hot key to ONE salt value and spreads nothing.
   */
  def saltBy(n: Int, cols: Column*): Column = {
    require(cols.nonEmpty, "saltBy needs at least one column to hash")
    pmod(hash(cols: _*), lit(n))
  }

  /**
   * Two-phase aggregation for skewed grouping keys: phase 1 aggregates on
   * `(keys, salt)` so a hot key spreads over `n` reducers; phase 2 merges
   * the partials. Works for any algebraic aggregate expressed as
   * (partial, merge) column pairs keyed by output name.
   *
   * {{{
   * Skew.saltedAgg(events, Seq("event_type"), 32)(
   *   "n" -> (count(lit(1)), cs => sum(cs)),
   *   "total" -> (sum(col("value")), cs => sum(cs)))
   * }}}
   */
  def saltedAgg(df: DataFrame, keys: Seq[String], n: Int = 32,
      saltCol: Option[Column] = None)(
      aggs: (String, (Column, Column => Column))*): DataFrame = {
    val phase1 = df
      .withColumn("__salt", saltCol.getOrElse(salt(n)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._2._1.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (name, (partial, _)) => partial.as(s"__p_$name") }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (name, (_, merge)) => merge(col(s"__p_$name")).as(name) }: _*)
  }

  /**
   * Skewed equi-join: the big (skewed) side gets a random salt in [0, n),
   * the small side is replicated n times, and the join key becomes
   * `(key, salt)` — a hot key's rows now land on n reducers instead of one.
   * Costs n x the small side's shuffle volume; prefer broadcast when the
   * small side fits, and AQE skew-join when splits suffice.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int = 16,
      saltCol: Option[Column] = None): DataFrame = {
    val bigSalted = big.withColumn("__salt", saltCol.getOrElse(salt(n)))
    val smallReplicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }

  /**
   * Key-skew profile: the `k` hottest values of `keyCol` with exact counts
   * and integer-ppm share of all rows — the measurement that decides
   * WHETHER to salt and with what factor (a key holding share_ppm of the
   * data caps any shuffle keyed on it at that fraction of one reducer;
   * salt with n >= share x reducers to restore balance). Exact integer
   * math and a (count desc, key) total order, so the profile is a pure
   * function of the data.
   *
   * Scale: one count agg with map-side combine, a 1-row total broadcast,
   * TakeOrdered top-k — the profile output is k rows however large the
   * input. The total deliberately counts the RAW input, not the per-key
   * counts: exchange reuse does not fire across the two branches, and a
   * zero-column count over a columnar source is a metadata-only scan,
   * where re-running the per-key hash agg would be a second full pass.
   */
  def skewProfile(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    require(k > 0, "k must be positive")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val total = df.groupBy().agg(count(lit(1)).as("__total"))
    counts.join(broadcast(total))
      .withColumn("share_ppm",
        expr("CAST(CAST(n AS DECIMAL(38,0)) * 1000000 DIV __total AS BIGINT)"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(k)
      .select(col(keyCol), col("n"), col("share_ppm"))
  }
}
