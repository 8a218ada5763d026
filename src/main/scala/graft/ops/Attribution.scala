package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Marketing-style touch attribution over an event stream: which touchpoint
 * (ad click, page view, campaign) gets credit for a later conversion. The
 * batch companions of the funnel operators ([[Funnels]]) — same
 * ONE-user-keyed-exchange discipline: attribution never needs a global
 * join, only per-user time order.
 *
 * Credits are exact integer ppm (parts per million) so any engine replays
 * them digit-for-digit and per-conversion credit always sums to exactly
 * 1e6 ([[linear]]'s remainder rule).
 */
object Attribution {

  /**
   * LAST-TOUCH attribution: each conversion row is attributed to the
   * channel of the latest touch at-or-before it (order
   * `(tsCol, idCol)` — the id breaks timestamp ties deterministically)
   * and within `lookbackUs` microseconds; conversions with no touch in
   * the window surface with a null channel (the "direct / unattributed"
   * bucket — dropping them silently would hide exactly the rows a
   * marketing report most needs to see).
   *
   * ONE shuffle on the user key: a running last-non-null window carries
   * each touch's `(ts, channel)` forward; conversions read it and apply
   * the lookback cut per row.
   *
   * Output: `(userCol, conversion_id, conv_ts, channel, touch_ts)`.
   */
  def lastTouch(
      events: DataFrame,
      userCol: String,
      idCol: String,
      tsCol: String,
      isConversion: Column,
      isTouch: Column,
      channel: Column,
      lookbackUs: Long): DataFrame = {
    require(lookbackUs > 0, s"lookbackUs must be positive, got $lookbackUs")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__t_ts", when(isTouch, col(tsCol)))
      .withColumn("__t_ch", when(isTouch, channel))
      .withColumn("__last_ts", last(col("__t_ts"), ignoreNulls = true).over(w))
      .withColumn("__last_ch", last(col("__t_ch"), ignoreNulls = true).over(w))
      .where(isConversion)
      .select(col(userCol), col(idCol).as("conversion_id"),
        col(tsCol).as("conv_ts"),
        when(col("__last_ts") >= col(tsCol) - expr(s"INTERVAL $lookbackUs MICROSECONDS"),
          col("__last_ch")).as("channel"),
        when(col("__last_ts") >= col(tsCol) - expr(s"INTERVAL $lookbackUs MICROSECONDS"),
          col("__last_ts")).as("touch_ts"))
  }

  /**
   * LINEAR multi-touch attribution: every touch at-or-before the
   * conversion (same `(ts, id)` tie rule) and within `lookbackUs` shares
   * the conversion's credit equally, in exact ppm — each touch gets
   * `1e6 DIV n` and the LATEST touch absorbs the division remainder, so
   * per-conversion credit sums to exactly 1,000,000 at any `n` (no float
   * shares, no lost ppm). Conversions with no touch in window are
   * omitted here (they carry no splittable credit; [[lastTouch]] is the
   * surface that reports them).
   *
   * Shape: conversions join touches on the USER key only — one shuffle
   * each side, pair width bounded by per-user activity in the lookback,
   * never a global range join. Output one row per `(conversion,
   * channel)` with the summed credit.
   */
  def linear(
      events: DataFrame,
      userCol: String,
      idCol: String,
      tsCol: String,
      isConversion: Column,
      isTouch: Column,
      channel: Column,
      lookbackUs: Long): DataFrame =
    creditPairs(events, userCol, idCol, tsCol, isConversion, isTouch, channel,
      lookbackUs,
      credit = when(col("__rk") === 1,
        lit(1000000L) - (col("__n") - 1) * expr("1000000 DIV __n"))
        .otherwise(expr("1000000 DIV __n")))

  /**
   * POSITION-BASED (U-shaped) multi-touch attribution: the first and last
   * touch each take `edgePct`% (the classic 40/40/20 with the default),
   * middle touches share the rest. Exact-ppm rules, conserving exactly
   * 1e6 per conversion:
   *  - 1 touch: 1,000,000;
   *  - 2 touches: an even 500,000 each (the standard no-middle
   *    degeneration);
   *  - n >= 3: first and last `edgePct * 1e4`, middles
   *    `rest DIV (n-2)` with the division remainder on the LAST touch.
   * Same pair shape and cost as [[linear]].
   */
  def positionBased(
      events: DataFrame,
      userCol: String,
      idCol: String,
      tsCol: String,
      isConversion: Column,
      isTouch: Column,
      channel: Column,
      lookbackUs: Long,
      edgePct: Int = 40): DataFrame = {
    require(edgePct >= 0 && 2 * edgePct <= 100,
      s"edgePct must be in [0,50], got $edgePct")
    val edge = edgePct * 10000L
    val middleTotal = 1000000L - 2 * edge
    val credit =
      when(col("__n") === 1, lit(1000000L))
        .when(col("__n") === 2,
          when(col("__rk") === 1, lit(500000L)).otherwise(lit(500000L)))
        .when(col("__rk") === col("__n"), lit(edge)) // first (rk is latest-first)
        .when(col("__rk") === 1, // last touch: edge + middle remainder
          lit(edge) + lit(middleTotal) - (col("__n") - 2) * expr(s"$middleTotal DIV (__n - 2)"))
        .otherwise(expr(s"$middleTotal DIV (__n - 2)"))
    creditPairs(events, userCol, idCol, tsCol, isConversion, isTouch, channel,
      lookbackUs, credit)
  }

  /**
   * FIRST-TOUCH attribution: the earliest in-window touch gets all
   * credit (the acquisition-channel report, dual of [[lastTouch]]).
   * A range-bounded window (`[conv_ts - lookback, conv_ts]` over the
   * micros domain) takes the min `(ts, id, channel)` tuple per row —
   * still ONE user-keyed exchange, no join. Unattributed conversions
   * surface with a null channel.
   *
   * Output: `(userCol, conversion_id, conv_ts, channel, touch_ts)` —
   * `conv_ts`/`touch_ts` in epoch micros (the range frame's domain).
   */
  def firstTouch(
      events: DataFrame,
      userCol: String,
      idCol: String,
      tsCol: String,
      isConversion: Column,
      isTouch: Column,
      channel: Column,
      lookbackUs: Long): DataFrame = {
    require(lookbackUs > 0, s"lookbackUs must be positive, got $lookbackUs")
    val w = Window.partitionBy(col(userCol)).orderBy(col("__ts_us"))
      .rangeBetween(-lookbackUs, 0)
    events
      .withColumn("__ts_us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__first",
        min(when(isTouch, struct(col("__ts_us"), col(idCol), channel.as("ch"))))
          .over(w))
      .where(isConversion)
      // mirror lastTouch's (ts, id) tie rule: the range frame admits
      // same-timestamp touches regardless of id, so a minimum that sits
      // at the conversion's own ts with a larger id is logically AFTER
      // the conversion — and since the min is the window's earliest
      // (ts, id), every other candidate is too; null it out
      .withColumn("__first",
        when(col("__first.__ts_us") === col("__ts_us") &&
          col("__first").getField(idCol) > col(idCol), lit(null))
          .otherwise(col("__first")))
      .select(col(userCol), col(idCol).as("conversion_id"),
        col("__ts_us").as("conv_ts"),
        col("__first.ch").as("channel"),
        col("__first.__ts_us").as("touch_ts"))
  }

  /** Shared conversion-x-touch pairing for the multi-touch models: user-key
    * equi-join, `(ts, id)` at-or-before tie rule, lookback cut, then
    * per-conversion latest-first rank `__rk` and size `__n` feed the
    * model's `credit` expression. */
  private def creditPairs(
      events: DataFrame,
      userCol: String,
      idCol: String,
      tsCol: String,
      isConversion: Column,
      isTouch: Column,
      channel: Column,
      lookbackUs: Long,
      credit: Column): DataFrame = {
    require(lookbackUs > 0, s"lookbackUs must be positive, got $lookbackUs")
    val convs = events.where(isConversion)
      .select(col(userCol), col(idCol).as("conversion_id"), col(tsCol).as("__cts"))
    val touches = events.where(isTouch)
      .select(col(userCol), col(idCol).as("__tid"), col(tsCol).as("__tts"),
        channel.as("channel"))
    val lb = expr(s"INTERVAL $lookbackUs MICROSECONDS")
    val pairs = convs.join(touches, userCol)
      .where((col("__tts") < col("__cts") ||
          (col("__tts") === col("__cts") && col("__tid") <= col("conversion_id"))) &&
        col("__tts") >= col("__cts") - lb)
    val wDesc = Window.partitionBy(col("conversion_id"))
      .orderBy(col("__tts").desc, col("__tid").desc)
    val wAll = Window.partitionBy(col("conversion_id"))
    pairs
      .withColumn("__rk", row_number().over(wDesc))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("credit_ppm", credit)
      .groupBy(col(userCol), col("conversion_id"), col("channel"))
      .agg(sum(col("credit_ppm")).as("credit_ppm"),
        count(lit(1)).as("n_touches"))
  }
}
