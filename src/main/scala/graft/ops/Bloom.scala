package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/**
 * Bloom-filter helpers over Spark's own sketch expressions
 * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair Catalyst's
 * runtime row-level filtering injects into shuffle joins). Exposed here so
 * pipelines can apply the same trick declaratively where the optimizer
 * can't see it: pre-filtering a huge stream against a seen-keys store
 * before the exact anti-join.
 *
 * Why it matters at 100 TB: an incremental dedup day shuffles the whole
 * day's documents against the fingerprint store. With a bloom pre-filter,
 * the ~99% of documents that are genuinely new short-circuit on a broadcast
 * bitmap (a few bytes per million keys of false-positive budget) and never
 * enter the join; only true duplicates and the ~1% false positives shuffle.
 * The filter is approximate but one-sided — `mightContain` has no false
 * negatives — and the exact anti-join behind it re-verifies, so the
 * composed result is exact.
 */
object Bloom {

  /**
   * Aggregate the xxhash64 of `key` into a serialized bloom filter sized
   * for `expectedItems` (binary, broadcastable; ~1.2 MB per million items
   * at the default 3% false-positive rate).
   */
  def bloomAgg(key: Column, expectedItems: Long = 1000000L): Column =
    GraftExpressionBridge.column(
      new BloomFilterAggregate(GraftExpressionBridge.expression(xxhash64(key)), expectedItems)
        .toAggregateExpression())

  /**
   * True when `key` may be in the filter, false when it definitely is not.
   * `might_contain` requires its filter side to be a constant or scalar
   * subquery (it deserializes the bitmap once per task, not per row), so
   * `bloom` must come from [[bloomFilterOf]]. A null filter (built over
   * zero rows) means an empty key set, so the answer is false, not null.
   */
  def mightContain(bloom: Column, key: Column): Column =
    coalesce(
      GraftExpressionBridge.column(BloomFilterMightContain(
        GraftExpressionBridge.expression(bloom),
        GraftExpressionBridge.expression(xxhash64(key)))),
      lit(false))

  /**
   * The bloom filter of `df`'s `key` column as a scalar-subquery Column —
   * usable directly inside `filter`/`withColumn` on another DataFrame. The
   * subquery executes once; its one-row result ships to every task (the
   * same shape Catalyst's injected runtime filters use).
   */
  def bloomFilterOf(df: DataFrame, key: String, expectedItems: Long = 1000000L): Column =
    GraftExpressionBridge.column(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        GraftExpressionBridge.analyzedPlan(
          df.agg(bloomAgg(col(key), expectedItems).as("__bf")))))

  /**
   * Exact anti join with a bloom short-circuit: rows of `left` whose `key`
   * is definitely absent from `right` pass straight through (no shuffle);
   * only the `mightContain` survivors go through the exact anti join.
   * Result is identical to `left.join(right, key, "left_anti")`.
   *
   * `expectedItems` MUST be at least the right side's cardinality: an
   * undersized filter saturates, every row tests might-contain and the
   * pre-filter turns into pure overhead. The default is 4M — Spark's own
   * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` ceiling, ~5 MB
   * of broadcast bitmap — so sizing stays lazy (no count job at plan-build
   * time) and only stores past 4M keys need explicit sizing, which also
   * requires raising that conf and `maxNumBits`. Pass -1 to size from a
   * `right.count()` instead (one extra evaluation of the right plan,
   * metadata-cheap for parquet-backed stores).
   *
   * The result is a two-leg union (pass-through + verified), so `left`'s
   * lineage is evaluated once per leg — Spark has no cross-branch plan
   * sharing without a cache. Callers whose `left` has expensive lineage
   * (more than a scan plus cheap projections) should `persist()` it first
   * and unpersist after the result is consumed. The flag column is computed
   * once before the split, so both legs share one bloom scalar subquery in
   * the analyzed plan rather than embedding two copies.
   */
  def antiJoinWithBloom(
      left: DataFrame,
      right: DataFrame,
      key: String,
      expectedItems: Long = 4000000L): DataFrame = {
    val items = if (expectedItems > 0) expectedItems else math.max(right.count(), 1L)
    // collision-proof internal name: a caller's own __graft_maybe column
    // must survive into the result untouched
    val flag = Iterator.from(0).map(i => s"__graft_maybe$i")
      .find(n => !left.columns.contains(n)).get
    val flagged = left.withColumn(flag,
      mightContain(bloomFilterOf(right, key, items), col(key)))
    val newForSure = flagged.filter(!col(flag)).drop(flag)
    // no distinct on the build side: left_anti ignores right duplicates
    val maybeSeen = flagged.filter(col(flag)).drop(flag)
      .join(right.select(col(key)), Seq(key), "left_anti")
    newForSure.unionByName(maybeSeen)
  }
}
