package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ordered funnel analysis over an event stream: how far each user
 * progresses through a sequence of step types, where step `i` counts only
 * if it occurs strictly after the user's first occurrence of step `i-1` —
 * the standard conversion metric (view -> click -> purchase).
 */
object Funnels {

  /**
   * Per-user funnel progress: one row per user who reached step 1, with
   * `t1..tk` (first time each step was reached, null once progress stops)
   * and `steps_reached`.
   *
   * Implementation: ONE user-keyed exchange at any step count. The events
   * (pre-filtered to the step types) sort once per user by time; the
   * strictly-after chaining is running-min window math over that single
   * partitioning — `running(i-1)` is the first qualifying step-`i-1` time
   * at or before each row, so a step-`i` row qualifies iff its time is
   * strictly greater — and the per-user `min` of each step's qualifying
   * times aggregates WITHOUT re-shuffling (the user-keyed Window already
   * satisfies the aggregation's distribution). The previous form (one
   * min-agg + equi-join per step) cost a shuffle per funnel step: 7
   * exchanges and 6 joins for a 3-step funnel, against one exchange here.
   * Default RANGE frames make running minima include all timestamp ties,
   * so results are independent of tie order (strict `>` excludes same-
   * instant progressions either way).
   *
   * `maxGap` (optional) adds the CONVERSION WINDOW every real funnel
   * analysis bounds progress with: step `i` counts only when it lands
   * within `maxGap` of `t(i-1)` — the FIRST qualifying occurrence of the
   * previous step (`ts > t(i-1) AND ts <= t(i-1) + maxGap`). Pass any
   * interval expression (`expr("INTERVAL 30 MINUTES")`) or a numeric
   * delta matching the timestamp column's type. The bound is one extra
   * predicate on the same running minimum — still ONE user-keyed
   * exchange at any step count.
   */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxGap: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val stepEvents = events
      .filter(col(typeCol).isin(steps.map(x => x: Any): _*))
      .select(col(userCol), col(tsCol), col(typeCol))
    val qualified = (2 to steps.size).foldLeft(
      stepEvents.withColumn("__c1", when(col(typeCol) === steps.head, col(tsCol)))) {
      (acc, i) =>
        val running = min(col(s"__c${i - 1}")).over(w)
        val within = maxGap.fold(lit(true))(g => col(tsCol) <= running + g)
        acc.withColumn(s"__c$i",
          when(col(typeCol) === steps(i - 1) && col(tsCol) > running && within, col(tsCol)))
    }
    val firsts = qualified.groupBy(col(userCol))
      .agg(min(col("__c1")).as("t1"),
        (2 to steps.size).map(i => min(col(s"__c$i")).as(s"t$i")): _*)
      .filter(col("t1").isNotNull)
    val reached = (1 to steps.size).map(i => when(col(s"t$i").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    firsts.withColumn("steps_reached", reached)
  }

  /**
   * Funnel conversion histogram: users per `steps_reached` level.
   *
   * `steps_reached >= 1` by construction: the population is users with at
   * least one step-1 event, so there is no level-0 bucket. Conversion-rate
   * consumers whose denominator is "all users in the event stream" must
   * compute that denominator separately (`events.select(user).distinct`) —
   * this histogram's denominator is the level-1 count.
   */
  def funnelCounts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxGap: Option[org.apache.spark.sql.Column] = None): DataFrame =
    funnel(events, userCol, tsCol, typeCol, steps, maxGap)
      .groupBy(col("steps_reached"))
      .agg(count(lit(1)).as("n_users"))

  /**
   * Retention cohort matrix: users grouped by their FIRST active bucket
   * (the cohort), counted once per later bucket they return in — the
   * "how many of January's new users were still here in March" table.
   * Output: `(cohort, bucket, n_users)` for every observed pair with
   * `bucket >= cohort`; read retention rate by dividing by the cohort's
   * own `bucket = cohort` row.
   *
   * Scale: a per-user min agg (cohort assignment) and a distinct
   * (user, bucket) agg — both user-keyed, map-side combining — then one
   * equi-join on the user key and a final tiny (cohort, bucket) agg.
   * Never a window over event history; never a per-user collect.
   */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      bucket: org.apache.spark.sql.Column): DataFrame = {
    val bucketed = events.select(col(userCol), bucket.as("bucket"))
    val cohorts = bucketed.groupBy(col(userCol)).agg(min(col("bucket")).as("cohort"))
    bucketed.distinct()
      .join(cohorts, Seq(userCol))
      .groupBy(col("cohort"), col("bucket"))
      .agg(count(lit(1)).as("n_users"))
  }

  /**
   * First-order transition counts over each user's event sequence: for
   * every consecutive `(from_type, to_type)` pair in `(tsCol, tieCol)`
   * order, the exact count and integer-ppm share of all transitions — the
   * Markov view of user journeys that funnels (which fix the step order
   * up front) cannot give. `tieCol` must make the per-user order total
   * (e.g. a unique event id), or the pairing is partition-dependent.
   *
   * Scale: one window shuffle on the user key (the same partitioning
   * sessionization uses), then a type-pair agg whose output is at most
   * |types|^2 rows. The total for the ppm share comes from a global window
   * over THAT bounded frame — one linear plan, one pass over raw events
   * (a separate total-agg branch would re-run the window + agg: exchange
   * reuse does not fire across the branch).
   */
  def transitionCounts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type")).agg(count(lit(1)).as("n"))
    // single-partition window is safe here BY BOUND: pairs <= |types|^2 rows
    pairs
      .withColumn("__total", sum(col("n")).over(Window.partitionBy()))
      .withColumn("share_ppm",
        expr("CAST(CAST(n AS DECIMAL(38,0)) * 1000000 DIV __total AS BIGINT)"))
      .select(col("from_type"), col("to_type"), col("n"), col("share_ppm"))
  }
}
