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

  /** A deterministic-enough salt in [0, n): spreads a hot key across n reducers. */
  def salt(n: Int): Column = pmod(hash(monotonically_increasing_id()), lit(n))

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
  def saltedAgg(df: DataFrame, keys: Seq[String], n: Int = 32)(
      aggs: (String, (Column, Column => Column))*): DataFrame = {
    val phase1 = df
      .withColumn("__salt", salt(n))
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
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int = 16): DataFrame = {
    val bigSalted = big.withColumn("__salt", salt(n))
    val smallReplicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
