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
 * Curation planning + incremental corpus ops: caps, weighted sampling,
 * BPE, typicality, mix planning, k-means, snapshots/SCD2, the mergeable
 * sketch family, drift.
 *
 * One battery family of [[Queries]] — split out for maintainability; the
 * query set and every definition are unchanged.
 */
private[graft] trait QueriesCuration extends QueryHelpers { this: QueryBattery =>
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
  private[graft] val BpeFixedMerges = Seq(
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
   * `temperature_mix`: [[graft.ops.TextAnalysis.sqrtMixWeights]] — the
   * α = 1/2 temperature-sampling mixture over sources (`p_i ∝ √tokens_i`,
   * the multilingual rebalancing law) in exact integers: the only
   * temperature with a libm-free exact power ([[graft.ops.TextAnalysis
   * .isqrt]]'s two-sided clamp), so natural share, sampled share and the
   * head/tail boost all replay digit-for-digit in the oracle.
   */
  def temperatureMixQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents").select(col("source"),
      TextAnalysis.whitespaceTokenCount(col("text")).cast("long").as("n_tok"))
    TextAnalysis.sqrtMixWeights(docs, "source", "n_tok")
  }

  val temperatureMixSql: String =
    raw"""WITH d AS (
         SELECT source,
                cast(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) as bigint) AS n_tok
         FROM documents),
       avail AS (SELECT source, cast(sum(n_tok) as bigint) AS n_tokens FROM d GROUP BY source),
       w0 AS (SELECT source, n_tokens,
                cast(floor(sqrt(cast(n_tokens as double))) as bigint) AS a FROM avail),
       w1 AS (SELECT source, n_tokens, CASE WHEN a * a > n_tokens THEN a - 1 ELSE a END AS a FROM w0),
       sq AS (SELECT source, n_tokens,
                CASE WHEN (a + 1) * (a + 1) <= n_tokens THEN a + 1 ELSE a END AS sqrt_tokens FROM w1),
       tot AS (SELECT cast(sum(n_tokens) as hugeint) AS t,
                      cast(sum(sqrt_tokens) as hugeint) AS st FROM sq),
       sh AS (SELECT source, n_tokens, sqrt_tokens,
                CASE WHEN t > 0 THEN cast(n_tokens as hugeint) * 1000000 // t END AS np,
                CASE WHEN st > 0 THEN cast(sqrt_tokens as hugeint) * 1000000 // st END AS wp
              FROM sq, tot)
       SELECT source, n_tokens, sqrt_tokens,
              cast(np as bigint) AS natural_ppm, cast(wp as bigint) AS weight_ppm,
              cast(CASE WHEN np > 0 THEN wp * 100 // np END as bigint) AS boost_x100
       FROM sh"""

  /**
   * `sketch_error`: [[graft.ops.Sketches.sketchErrorProfile]] — the
   * sketch-accuracy eval that closes the quantile-sketch loop the way
   * `ann_recall` closes ANN's: k = 128 KMV estimates vs the exact
   * nearest-rank percentiles of event cents per type, signed error and
   * relative ppm. Both the deterministic md5 sample and the exact
   * percentile replay in SQL, so even the ERROR itself hash-matches.
   */
  def sketchErrorQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(col("event_type"), col("event_id"),
      cents(col("value")).as("cents"))
    graft.ops.Sketches.sketchErrorProfile(ev, "event_type", "event_id",
      "cents", Seq(50, 90, 99), k = 128)
  }

  val sketchErrorSql: String =
    """WITH e AS (SELECT event_type, event_id,
                  CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
       ranked AS (
         SELECT event_type, cents,
                row_number() OVER (PARTITION BY event_type
                                   ORDER BY md5(cast(event_id AS varchar))) AS rn
         FROM e WHERE cents IS NOT NULL),
       s AS (SELECT event_type,
               list_sort(list_filter(list(cents), x -> x IS NOT NULL)) AS vs
             FROM ranked WHERE rn <= 128 GROUP BY event_type),
       est AS (
         SELECT event_type, 50 AS pct,
                vs[greatest(cast(ceil(0.5 * len(vs)) AS int), 1)] AS est FROM s
         UNION ALL
         SELECT event_type, 90,
                vs[greatest(cast(ceil(0.9 * len(vs)) AS int), 1)] FROM s
         UNION ALL
         SELECT event_type, 99,
                vs[greatest(cast(ceil(0.99 * len(vs)) AS int), 1)] FROM s),
       ex AS (
         SELECT event_type, cents,
                row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rk,
                count(*) OVER (PARTITION BY event_type) AS n
         FROM e WHERE cents IS NOT NULL),
       exact AS (
         SELECT event_type, p.pct, min(cents) AS exact
         FROM ex, (SELECT unnest([50, 90, 99]) AS pct) p
         WHERE rk = (n * p.pct + 99) // 100
         GROUP BY 1, 2)
       SELECT est.event_type, CAST(est.pct AS BIGINT) AS pct, est.est, exact.exact,
              est.est - exact.exact AS err,
              CAST(abs(CAST(est.est - exact.exact AS HUGEINT)) * 1000000
                   // greatest(CAST(1 AS HUGEINT), abs(CAST(exact.exact AS HUGEINT))) AS BIGINT) AS abs_err_ppm
       FROM est JOIN exact USING (event_type, pct)"""

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
   * events. DuckDB has no DataSketches twin, so the ESTIMATE itself can't
   * hash-match — but a VERDICT about it can: the query joins the merged
   * estimate against the exact `count(distinct)` and emits the exact count
   * plus `est_within_bound = |est − exact|·1e6 DIV exact <= 50000` (5% =
   * ~3σ of HLL lgK=12's 1.04/√4096 ≈ 1.6% relative error). The oracle
   * replays the exact side and asserts the bound column TRUE, so the
   * driver's hash check now fails if the sketch estimate (or the daily →
   * all-time merge) ever drifts past the bound. SketchesSpec still pins
   * the raw estimate's accuracy and exact merge equality.
   */
  def distinctUsersSketch(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(col("event_type"),
      to_date(col("ts").cast("timestamp")).as("day"), col("user_id"))
    val daily = graft.ops.Sketches.distinctRollup(ev, Seq("event_type", "day"), "user_id")
    val est = graft.ops.Sketches.reRollup(daily, Seq("event_type"))
      .select(col("event_type"), col("distinct_est"))
    val exact = events(dir).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("distinct_exact"))
    est.join(exact, Seq("event_type"))
      .select(col("event_type"), col("distinct_exact"),
        expr("abs(distinct_est - distinct_exact) * 1000000L DIV distinct_exact <= 50000L")
          .as("est_within_bound"))
  }

  val distinctUsersSketchSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS distinct_exact,
       TRUE AS est_within_bound
       FROM events GROUP BY event_type"""

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
   * `audience_overlap`: the KMV set-sketch pipeline
   * ([[graft.ops.Sketches.kmvSetSketch]] → [[graft.ops.Sketches
   * .kmvSetOps]]) — per epoch-day-mod-7 bucket, how many users do the
   * click and view audiences share, estimated purely from two 128-hash
   * sketches: distinct sizes, union, overlap count, intersection and
   * Jaccard, every step deterministic integer arithmetic on md5
   * prefixes. The oracle replays the distinct-hash collapse, both
   * bottom-128 samples, the 60-bit prefix conversion and every truncated
   * division digit-for-digit — the determinism no randomized sample
   * allows. At 100 TB the overlap question joins KB-sized sketch rows,
   * never the raw user sets.
   */
  def audienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(col("event_type"),
      expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000 % 7").as("dow"),
      col("user_id"))
    val a = graft.ops.Sketches.kmvSetSketch(
      ev.where(col("event_type") === "click"), Seq("dow"), "user_id", k = 128)
    val b = graft.ops.Sketches.kmvSetSketch(
      ev.where(col("event_type") === "view"), Seq("dow"), "user_id", k = 128)
    graft.ops.Sketches.kmvSetOps(a, b, Seq("dow"), k = 128)
  }

  val audienceOverlapSql: String = {
    def hexVal(h: String): String =
      (1 to 15).map(i => s"(strpos('0123456789abcdef', substring($h, $i, 1)) - 1)")
        .reduce((acc, d) => s"($acc * 16 + $d)")
    val est = (kmv: String, kth: String) =>
      s"CASE WHEN len($kmv) < 128 THEN len($kmv) " +
        s"ELSE CAST(127 AS HUGEINT) * 1152921504606846976 // ${hexVal(kth)} END"
    s"""WITH ev AS (SELECT event_type, epoch_us(ts) // 86400000000 % 7 AS dow, user_id
                  FROM events),
       ha AS (SELECT DISTINCT dow, md5(CAST(user_id AS VARCHAR)) AS h
              FROM ev WHERE event_type = 'click' AND user_id IS NOT NULL),
       hb AS (SELECT DISTINCT dow, md5(CAST(user_id AS VARCHAR)) AS h
              FROM ev WHERE event_type = 'view' AND user_id IS NOT NULL),
       sa AS (SELECT dow, list_slice(list_sort(list(h)), 1, 128) AS ka FROM ha GROUP BY 1),
       sb AS (SELECT dow, list_slice(list_sort(list(h)), 1, 128) AS kb FROM hb GROUP BY 1),
       j AS (SELECT sa.dow, ka, kb,
               list_slice(list_sort(list_distinct(ka || kb)), 1, 128) AS u
             FROM sa JOIN sb ON sa.dow = sb.dow),
       m AS (SELECT dow, ka, kb, u, u[len(u)] AS mx,
               CAST(len(list_filter(list_intersect(ka, kb), x -> x <= u[len(u)]))
                 AS BIGINT) AS overlap_k
             FROM j),
       e AS (SELECT dow, overlap_k, len(u) AS ulen,
               ${est("ka", "ka[128]")} AS n_a_est,
               ${est("kb", "kb[128]")} AS n_b_est,
               ${est("u", "mx")} AS union_est
             FROM m)
       SELECT dow, CAST(n_a_est AS BIGINT) AS n_a_est,
              CAST(n_b_est AS BIGINT) AS n_b_est,
              CAST(union_est AS BIGINT) AS union_est, overlap_k,
              CAST(CASE WHEN ulen = 0 THEN 0
                   ELSE overlap_k * union_est // ulen END AS BIGINT) AS inter_est,
              CAST(CASE WHEN ulen = 0 THEN 0
                   ELSE overlap_k * 1000000 // ulen END AS BIGINT) AS jaccard_ppm
       FROM e"""
  }

  /**
   * `join_size_cms`: [[graft.ops.Sketches.cmsJoinSize]] — the equi-join
   * output size of the even- vs odd-user event halves on event_type,
   * estimated purely from merged daily CMS grids (the pre-flight
   * shuffle-size check: no scan of either side at estimate time). At
   * event-type cardinality the 1024-cell rows are collision-free, so the
   * inner product replays the EXACT join size and the oracle
   * hash-matches the plain count-join — the same exactness regime
   * `cms_counts` pins; the collision-regime upper bound is spec'd in
   * SketchesSpec.
   */
  def joinSizeCms(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = events(dir).select(col("event_type"),
      to_date(col("ts").cast("timestamp")).as("day"),
      (col("user_id") % 2 === 0).as("in_a"))
    def side(f: Column, as: String) = graft.ops.Sketches.reRollupCms(
      graft.ops.Sketches.cmsRollup(ev.where(f), Seq("day"), "event_type"), Seq.empty)
      .withColumnRenamed("cms", as)
    side(col("in_a"), "ca").crossJoin(broadcast(side(!col("in_a"), "cb")))
      .select(graft.ops.Sketches.cmsJoinSize(col("ca"), col("cb"))
        .as("est_join_size"))
  }

  val joinSizeCmsSql: String =
    """SELECT CAST(sum(a.n * b.n) AS BIGINT) AS est_join_size
       FROM (SELECT event_type, count(*) AS n FROM events
             WHERE user_id % 2 = 0 GROUP BY 1) a
       JOIN (SELECT event_type, count(*) AS n FROM events
             WHERE user_id % 2 <> 0 GROUP BY 1) b
       USING (event_type)"""

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
   * `zipf_slope`: the corpus's Zipf rank-frequency law in one fit
   * ([[TextAnalysis.zipfSlope]]) — floor-log2 frequency against
   * floor-log2 rank (integer bit lengths, libm-free) through the exact
   * integer-ppm OLS; natural text sits near slope −1e6, and a flattened
   * head or amputated tail flags boilerplate-stamped or over-deduped
   * corpora. Rank rides the range-partition recipe; the fit is ONE
   * six-sum agg over the vocabulary.
   */
  def zipfSlopeQ(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    TextAnalysis.zipfSlope(t(dir, "documents"), "text")
  }

  val zipfSlopeSql: String =
    s"""WITH tc AS (
         SELECT t AS term, CAST(count(*) AS BIGINT) AS cnt
         FROM (SELECT unnest($Toks) AS t FROM documents) GROUP BY 1),
       r AS (SELECT cnt,
               row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank
             FROM tc),
       l AS (SELECT CAST(length(bin(rank)) - 1 AS HUGEINT) AS x,
                    CAST(length(bin(cnt)) - 1 AS HUGEINT) AS y
             FROM r),
       s AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
                    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
             FROM l),
       d AS (SELECT n, sx, sy,
                    n * sxx - sx * sx AS dxx, n * sxy - sx * sy AS dxy,
                    n * syy - sy * sy AS dyy
             FROM s)
       SELECT CAST(n AS BIGINT) AS n,
         CAST(CASE WHEN dxx = 0 THEN NULL
              ELSE dxy * 1000000 // dxx END AS BIGINT) AS slope_ppm,
         CAST(CASE WHEN dxx = 0 THEN NULL
              ELSE (sy * 1000000 - (dxy * 1000000 // dxx) * sx) // n
              END AS BIGINT) AS intercept_ppm,
         CAST(CASE WHEN dxx = 0 OR dyy = 0 THEN NULL
              ELSE (dxy * 1000000 // dxx) * (dxy * 1000000000 // dyy) // 1000000000
              END AS BIGINT) AS r2_ppm
       FROM d"""
}
