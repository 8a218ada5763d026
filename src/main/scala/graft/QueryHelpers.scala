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
 * Shared cross-engine helpers for the query battery: exact-integer money
 * folds, table readers, and the DuckDB-side SQL fragment builders every
 * family trait reuses (see [[Queries]] for the determinism rules).
 */
private[graft] trait QueryHelpers {

  // ---- portable helpers (Spark side) ----------------------------------

  /** Exact cents: prices have 2 decimals, so this is lossless. */
  private[graft] def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Exact percent units for 2-decimal rates (discount, tax). */
  private[graft] def pct(c: Column): Column = round(c * 100, 0).cast("long")

  private[graft] def t(dir: String, name: String)(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /**
   * `events.ts` is nanosecond-precision parquet, which Spark 4 only reads as
   * a raw long (`spark.sql.legacy.parquet.nanosAsLong`, set by Verify/Bench).
   * Truncate to micros with exact integer division (the ns values exceed
   * 2^53, so double division would corrupt them) — matching DuckDB's own
   * ns -> us truncation.
   */
  private[graft] def events(dir: String)(implicit spark: SparkSession): DataFrame = {
    val df = t(dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => df
    }
  }

  /** `ts` columns may load as TIMESTAMP_NTZ; normalize (UTC session). */
  private[graft] def micros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /**
   * A 1e-4-dollar integer amount rounded HALF-UP to whole cents in exact
   * integer arithmetic, then ONE shared double division to dollars.
   * Replaces `round(x / 10000.0, 2)`, whose double round-half is
   * engine-divergent: when a sum lands exactly on x.xx5 the binary
   * double is just below it, Spark's round (shortest-decimal via
   * BigDecimal.valueOf) says .x(x+1) while DuckDB (binary value) says
   * .xx — a one-penny hash mismatch (q9 at sf0.001 hit it). Integer
   * half-up has no representability boundary, and the final `/100.0`
   * is a single IEEE op on the SAME integer both engines — bit-identical.
   */
  private[graft] def money2(c: Column, perCent: Long = 100L): Column = {
    val l = c.cast("decimal(38,0)")
    val half = lit(perCent / 2)
    val centsHalfUp = when(l >= 0, floor((l + half) / perCent))
      .otherwise(-floor((-l + half) / perCent))
    (centsHalfUp.cast("double") / 100.0)
  }

  // ---- portable helpers (DuckDB side) ---------------------------------

  private[graft] def sqlCents(c: String) = s"cast(round($c * 100, 0) as bigint)"

  /** DuckDB twin of [[money2]] (`e` must already be an integer type). */
  private[graft] def sqlMoney2(e: String, perCent: Long = 100L): String =
    s"CAST(CASE WHEN ($e) >= 0 THEN (($e) + ${perCent / 2}) // $perCent " +
      s"ELSE -((-($e) + ${perCent / 2}) // $perCent) END AS DOUBLE) / 100"

  /** DuckDB twin of `TextAnalysis.hashBucket`: first-16-bit md5 bucket of
    * `salt:id` in [0, 65536) — one definition for every sampling oracle. */
  private[graft] def sqlHashBucket(idExpr: String, salt: String = "graft"): String = {
    def digit(i: Int) =
      s"(strpos('0123456789abcdef', substring(md5('$salt:' || $idExpr), $i, 1)) - 1)"
    s"(((${digit(1)} * 16 + ${digit(2)}) * 16 + ${digit(3)}) * 16 + ${digit(4)})"
  }
  private[graft] val Norm = raw"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"
  private[graft] val Toks = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
  /** Cosine over `qv`/`nv` list columns (twin of [[Similarity.cosine]]).
    * Declared with the other SQL helpers: any val referenced by an earlier
    * val would silently interpolate as "null" (Scala init order). */
  private[graft] val SqlCos = {
    val dot = "list_sum(list_transform(range(1, len(qv) + 1), i -> cast(qv[i] as double) * cast(nv[i] as double)))"
    val nq = "sqrt(list_sum(list_transform(qv, x -> cast(x as double) * cast(x as double))))"
    val nn = "sqrt(list_sum(list_transform(nv, x -> cast(x as double) * cast(x as double))))"
    // zero-norm guard mirrors the kernel: cosine against a zero vector is 0,
    // never NaN (NaN sorts first under DuckDB's ORDER BY DESC but last in
    // Spark's struct min — a silent rank divergence)
    s"round(CASE WHEN $nq * $nn = 0 THEN 0 ELSE $dot / ($nq * $nn) END, 4)"
  }

  /** Word 5-gram shingles over a `toks` column (twin of [[Dedup.wordShingles]]). */
  private[graft] val SqlShingles =
    "list_distinct(list_transform(range(1, greatest(len(toks) - 4, 1) + 1), i -> array_to_string(toks[i:i+4], ' ')))"
  private[graft] val SqlShingleDocs =
    s"(SELECT doc_id, $SqlShingles AS sh FROM (SELECT doc_id, $Toks AS toks FROM documents))"

  // =====================================================================
  // Framework battery
  // =====================================================================
}

/**
 * The full battery surface: every family trait mixed together. Family
 * traits self-type against this so any query may reuse another family's
 * helpers (shared CTE fragments, cluster oracles) regardless of file.
 */
private[graft] trait QueryBattery
  extends QueriesTpch
  with QueriesDedup
  with QueriesAnnCorpus
  with QueriesCuration
  with QueriesTimeseries
  with QueriesGraphsDq
  with QueriesRetrieval
