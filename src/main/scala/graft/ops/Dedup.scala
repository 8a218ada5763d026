package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for LLM training-data pipelines: exact (hash
 * groupBy), near-duplicate via MinHash + LSH banding, SimHash fingerprints
 * and n-gram Jaccard verification.
 *
 * Scale design (100 TB):
 *  - signature computation (shingle -> md5 -> min) is per-row, shuffle-free,
 *    whole-stage-codegen'd — it streams at scan speed;
 *  - LSH candidates come from an equi-join on `(band, band_hash)`, i.e. one
 *    shuffle keyed on a high-cardinality hash — never an all-pairs
 *    `crossJoin`. Bucket sizes are bounded (docs sharing a band hash), and
 *    AQE skew-join handles pathological boilerplate buckets; for known-skewed
 *    corpora, drop buckets larger than a cap before pairing (`maxBucket`);
 *  - the exact-Jaccard verify runs only on candidate pairs.
 *
 * Hashes are md5 (identical hex in every engine) so the driver's DuckDB
 * oracle reproduces signatures bit-for-bit.
 */
object Dedup {

  import TextAnalysis.normalize

  /**
   * Exact dedup: keep one row per normalized text, the one with the smallest
   * `keyCol` (deterministic keeper). One shuffle on the text hash.
   */
  def exact(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val w = Window.partitionBy(md5(normalize(col(textCol)))).orderBy(col(keyCol))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Distinct character `k`-shingles of the normalized text (min 1 shingle for short docs). */
  def shingles(text: Column, k: Int = 8): Column = {
    val norm = normalize(text)
    val starts = sequence(lit(1), greatest(length(norm) - (k - 1), lit(1)))
    array_distinct(transform(starts, i => substring(norm, i, lit(k))))
  }

  /**
   * MinHash signature component `j`: the lexicographic minimum, over the
   * document's shingles, of an 8-hex-char hash of the shingle. Minima of
   * independent keyed hashes approximate permutation minima, so equality
   * rate across docs estimates Jaccard similarity.
   *
   * One md5 yields FOUR independent signature components (its 32 hex chars
   * split into 8-char words), so an n-hash signature costs ceil(n/4) md5
   * evaluations per shingle instead of n — md5 dominates the cost of the
   * whole dedup scan, and this stays bit-portable to any engine
   * (lexicographic min of fixed-width hex == numeric min).
   */
  def minhash(shingleArr: Column, j: Int): Column = {
    val (block, word) = (j / 4, j % 4)
    array_min(transform(shingleArr,
      s => substring(md5(concat(s, lit(s":$block"))), word * 8 + 1, 8)))
  }

  /** Add `mh0..mh{n-1}` signature columns; ceil(n/4) md5 calls per shingle. */
  def withMinhashSignature(df: DataFrame, textCol: String, numHashes: Int = 12, k: Int = 8): DataFrame = {
    val blocks = (numHashes + 3) / 4
    val withBlocks = df
      .withColumn("__sh", shingles(col(textCol), k))
      .select(col("*") +: (0 until blocks).map(b =>
        transform(col("__sh"), s => md5(concat(s, lit(s":$b")))).as(s"__md5_$b")): _*)
    withBlocks
      .select(col("*") +: (0 until numHashes).map { j =>
        val (block, word) = (j / 4, j % 4)
        array_min(transform(col(s"__md5_$block"), h => substring(h, word * 8 + 1, 8)))
          .as(s"mh$j")
      }: _*)
      .drop("__sh" +: (0 until blocks).map(b => s"__md5_$b"): _*)
  }

  /**
   * LSH banding: hash `rowsPerBand` consecutive signature components per band;
   * docs colliding in any band become candidate pairs. With `b` bands of `r`
   * rows, a pair of Jaccard `s` collides with probability `1-(1-s^r)^b`.
   */
  def bandHashes(numHashes: Int, rowsPerBand: Int): Seq[Column] = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide evenly into bands")
    (0 until numHashes / rowsPerBand).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i"))
      md5(concat_ws("|", cols: _*)).as(s"band$b")
    }
  }

  /**
   * Candidate near-duplicate pairs `(id_a < id_b)` from LSH bucket collisions.
   * `maxBucket` drops degenerate buckets (boilerplate text) before pairing.
   */
  def lshCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 12,
      rowsPerBand: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val bands = numHashes / rowsPerBand
    val sig = withMinhashSignature(df.select(idCol, textCol), textCol, numHashes)
    val banded = sig
      .select(col(idCol) +: bandHashes(numHashes, rowsPerBand): _*)
      .select(col(idCol), explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), col(s"band$b").as("bh"))): _*)).as("e"))
      .select(col(idCol), col("e.band").as("band"), col("e.bh").as("bh"))
    val capped = banded
      .withColumn("bucket_n", count("*").over(Window.partitionBy(col("band"), col("bh"))))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    val a = capped.select(col("band"), col("bh"), col(idCol).as("id_a"))
    val b = capped.select(col("band"), col("bh"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Exact Jaccard similarity between two shingle/token arrays. */
  def jaccard(a: Column, b: Column): Column =
    round(
      size(array_intersect(a, b)).cast("double") /
        greatest(size(array_union(a, b)), lit(1)),
      4)

  /**
   * Near-duplicate pairs: LSH candidates verified by exact shingle Jaccard
   * at `threshold`. The verify join touches only candidate rows.
   */
  def nearDuplicatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 12,
      rowsPerBand: Int = 3): DataFrame = {
    val candidates = lshCandidatePairs(df, idCol, textCol, numHashes, rowsPerBand)
    val docs = df.select(col(idCol), shingles(col(textCol)).as("sh"))
    candidates
      .join(docs.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(docs.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /**
   * 32-bit SimHash: one bit per md5 hex digit parity, majority-voted across
   * tokens. Near-duplicates land within a small Hamming distance. Uses only
   * engine-portable primitives (md5, substring, char position) so the oracle
   * can reproduce it.
   */
  def simhash32(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val hexDigits = "0123456789abcdef"
    // bit j of token t = parity of md5(t)'s j-th hex digit
    def bit(tok: Column, j: Column): Column =
      (instr(lit(hexDigits), substring(md5(tok), 1, 32).substr(j, lit(1))) - 1) % 2
    val bits = transform(sequence(lit(1), lit(32)), j =>
      when(aggregate(toks, lit(0L), (acc, t) => acc + (bit(t, j) * 2 - 1)) > 0, 1L).otherwise(0L))
    aggregate(zip_with(bits, sequence(lit(0), lit(31)), (b, i) => (b * pow(lit(2.0), i)).cast("long")),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two simhash fingerprints. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
