package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Join shapes Spark has no single operator for, built from shuffles Spark
 * does have — an as-of (temporal) join and a point-in-interval range join.
 * Both avoid the naive non-equi join (an O(n*m) broadcast-nested-loop at
 * cluster scale) by reducing to ONE equi-shuffle plus per-partition work.
 */
object Joins {

  /**
   * As-of join: for every left row, attach the latest right payload whose
   * `tsCol` is at or before the left row's (per join `keys`) — the canonical
   * "state at event time" lookup (market data, dimension snapshots, feature
   * stores).
   *
   * Implementation is a tagged union + running `last(ignoreNulls)` window,
   * NOT a join: both sides shuffle once on `keys`, each partition sorts by
   * `(ts, side)` and the payload carries forward. No range predicate ever
   * reaches a join operator, so Catalyst can never degrade it to a
   * nested-loop; it scales exactly like one window aggregation.
   *
   * Right rows must be unique per `(keys, tsCol)` (pre-aggregate otherwise);
   * equal timestamps resolve as right-before-left, i.e. inclusive (`>=`,
   * and `<=` in forward mode). Payload columns surface as `asof_<name>`;
   * left rows with no matching right row keep null payloads (left-outer
   * semantics). The match is by ROW: the nearest right row's payload is
   * returned even where its fields are null, exactly like SQL ASOF. Rows
   * with a null timestamp follow comparison semantics — a null-ts right
   * row matches nothing, a null-ts left row gets null payloads.
   *
   * `direction` picks the match side: `"backward"` (default) takes the
   * latest right row at-or-before the left timestamp; `"forward"` the
   * earliest at-or-after ("next quote", "first event following signup");
   * `"nearest"` whichever of those two is closer in absolute distance,
   * ties resolving BACKWARD (the pandas `merge_asof` direction set,
   * completed). Nearest runs both walks as two windows over the SAME
   * key partitioning — still one shuffle, two sorts — and picks per
   * row; it requires a numeric `tsCol` (epoch micros/days...), as the
   * distance compare is plain subtraction. `tolerance` (same units as
   * `tsCol`, default unbounded) nulls the payload when the matched row
   * is further than that from the left timestamp — the feature-store
   * staleness bound, applied per row after the match so it costs
   * nothing extra.
   */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      direction: String = "backward",
      tolerance: Long = Long.MaxValue,
      allowExactMatches: Boolean = true): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward, forward or nearest, got $direction")
    require(tolerance >= 0, "tolerance must be non-negative")
    if (direction == "nearest")
      return asOfNearest(left, right, keys, tsCol, tolerance, allowExactMatches)
    val (l, r, payload, leftRest) = taggedSides(left, right, keys, tsCol)
    // backward walks time ascending, forward descending: either way the
    // right row "seen last" in the walk is the nearest eligible match, and
    // the tie order at EQUAL timestamps decides the boundary: right side
    // (0) first = inclusive (a trade at the quote's instant matches it),
    // left first = strict (`allowExactMatches = false`, pandas-style — the
    // quote must be strictly before/after). Nulls order FIRST in both
    // walks so a left row with no timestamp sees no right row and keeps
    // null payloads.
    val ord = if (direction == "backward") col(tsCol).asc_nulls_first
      else col(tsCol).desc_nulls_first
    val tie = if (allowExactMatches) col("__side").asc else col("__side").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord, tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the matched timestamp is only consulted by a staleness bound, so with
    // unbounded tolerance the window carries just the payload struct — the
    // extra nested struct + ts copy per row is pure sort/aggregation weight
    val carried =
      if (tolerance == Long.MaxValue) col("__asof")
      else struct(col(tsCol).as("__ts"), col("__asof"))
    val matched = l.unionByName(r)
      .select(
        keys.map(col) ++ Seq(col(tsCol), col("__side")) ++ leftRest.map(col) ++
          Seq(last(when(col("__side") === 0, carried), ignoreNulls = true)
            .over(w).as("__m")): _*)
      .filter(col("__side") === 1)
      .drop("__side")
    val (inRange, payloadOf) =
      if (tolerance == Long.MaxValue)
        (col("__m").isNotNull, (c: String) => col(s"__m.$c"))
      else
        (abs(col(tsCol) - col("__m.__ts")) <= tolerance, (c: String) => col(s"__m.__asof.$c"))
    matched.select(
      keys.map(col) ++ Seq(col(tsCol)) ++ leftRest.map(col) ++
        payload.map(c => when(inRange, payloadOf(c)).as(s"asof_$c")): _*)
  }

  /** Shared tagged-union construction: left rows as `__side = 1` with a
    * null payload struct, right rows as `__side = 0` carrying their payload
    * as ONE struct (so the matched row's fields travel together — a
    * per-column last(ignoreNulls) would skip past a null field to an
    * older/farther row's value, silently mixing rows). Right rows with a
    * null timestamp can never be "at or before/after" anything and are
    * dropped, as the SQL comparison semantics would. */
  private def taggedSides(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String): (DataFrame, DataFrame, Seq[String], Seq[String]) = {
    val payload = right.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val leftRest = left.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val l = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__side")) ++
        leftRest.map(col) ++
        Seq(lit(null)
          .cast(org.apache.spark.sql.types.StructType(
            right.schema.fields.filter(f => payload.contains(f.name))))
          .as("__asof")): _*)
    val r = right
      .filter(col(tsCol).isNotNull)
      .select(
        keys.map(col) ++ Seq(col(tsCol), lit(0).as("__side")) ++
          leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          Seq(struct(payload.map(col): _*).as("__asof")): _*)
    (l, r, payload, leftRest)
  }

  /**
   * `direction = "nearest"`: the backward and forward walks run as TWO
   * running `last(ignoreNulls)` windows over the SAME key partitioning
   * (one exchange, two in-partition sorts), each carrying the candidate's
   * `(ts, payload)` struct; per left row the closer candidate wins,
   * absolute-distance ties resolving backward (the earlier right row).
   * `allowExactMatches = false` excludes same-instant right rows from
   * BOTH walks via the tie order, exactly as in the single-direction
   * form.
   */
  private def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tolerance: Long,
      allowExactMatches: Boolean): DataFrame = {
    val (l, r, payload, leftRest) = taggedSides(left, right, keys, tsCol)
    val tie = if (allowExactMatches) col("__side").asc else col("__side").desc
    def walk(ord: Column) = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord, tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = struct(col(tsCol).as("__ts"), col("__asof"))
    val cand = last(when(col("__side") === 0, carried), ignoreNulls = true)
    val matched = l.unionByName(r)
      .select(
        keys.map(col) ++ Seq(col(tsCol), col("__side")) ++ leftRest.map(col) ++ Seq(
          cand.over(walk(col(tsCol).asc_nulls_first)).as("__mb"),
          cand.over(walk(col(tsCol).desc_nulls_first)).as("__mf")): _*)
      .filter(col("__side") === 1)
      .drop("__side")
    // distances are non-negative by construction (each walk only sees its
    // own side of the left timestamp); tie -> backward via <=
    val useBackward = col("__mb").isNotNull &&
      (col("__mf").isNull ||
        col(tsCol) - col("__mb.__ts") <= col("__mf.__ts") - col(tsCol))
    val chosen = when(useBackward, col("__mb")).otherwise(col("__mf"))
    val inRange = chosen.isNotNull &&
      abs(col(tsCol) - chosen.getField("__ts")) <= tolerance
    matched.select(
      keys.map(col) ++ Seq(col(tsCol)) ++ leftRest.map(col) ++
        payload.map(c =>
          when(inRange, chosen.getField("__asof").getField(c)).as(s"asof_$c")): _*)
  }

  /**
   * Range join: match every point to every interval containing it
   * (`start <= point < end`). Intervals explode onto fixed-width buckets,
   * points hash to their single bucket, and the match becomes an equi-join
   * on the bucket id plus a residual bound filter — one shuffle keyed on
   * bucket, never a cross/nested-loop join. Each (point, interval) pair
   * meets in exactly one bucket (the point's), so no dedup pass is needed.
   *
   * `pointCol`/`startCol`/`endCol` are integer-domain (epoch days, epoch
   * seconds, ids...). `bucketWidth` should be on the order of the typical
   * interval length: much smaller multiplies the interval replication,
   * much larger multiplies the residual-filter false candidates.
   */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    val p = points.withColumn("__bucket", bucketOf(col(pointCol)))
    val i = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol) - 1))))
    p.join(i, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }

  /**
   * Interval overlap join: every left interval `[leftLo, leftHi)` paired
   * with every right interval `[rightLo, rightHi)` it overlaps — campaign
   * windows x activity windows, downtime x sessions, any two timelines.
   *
   * Both sides explode onto fixed-width buckets and meet in an equi-join on
   * the bucket id, with the overlap bounds as a residual filter — one
   * shuffle keyed on bucket, never a nested loop. An overlapping pair
   * shares every bucket its intersection covers; the pair is emitted only
   * in the bucket containing `greatest(leftLo, rightLo)` (the first common
   * one), so each pair appears exactly once without a distinct pass.
   *
   * Column names must be disjoint across the two sides (as with any Spark
   * join). Bounds are integer-domain; `bucketWidth` on the order of the
   * typical interval length, as in [[rangeJoin]].
   */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      leftLo: String,
      leftHi: String,
      rightLo: String,
      rightHi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    def explodeBuckets(df: DataFrame, lo: String, hi: String): DataFrame = df
      .filter(col(lo) < col(hi))
      .withColumn("__bucket", explode(sequence(bucketOf(col(lo)), bucketOf(col(hi) - 1))))
    explodeBuckets(left, leftLo, leftHi)
      .join(explodeBuckets(right, rightLo, rightHi), Seq("__bucket"))
      .filter(col(leftLo) < col(rightHi) && col(rightLo) < col(leftHi) &&
        bucketOf(greatest(col(leftLo), col(rightLo))) === col("__bucket"))
      .drop("__bucket")
  }
}
