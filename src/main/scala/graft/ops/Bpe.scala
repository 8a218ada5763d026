package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding tokenizer TRAINING on the corpus — the step beyond
 * [[TextAnalysis.bpePairs]]'s single pair count: iterate "count adjacent
 * pairs, merge the most frequent" to learn an ordered merge list, the
 * artifact a BPE tokenizer ships. [[applyMerges]] then tokenizes any text
 * with the learned merges, entirely in Catalyst expressions.
 *
 * Scale: the corpus is read ONCE (the initial word count); every merge
 * round after that is vocabulary-sized — pair counting collapses to a
 * per-distinct-word explode weighted by word frequency (the standard
 * trick that makes BPE training corpus-size-independent), and the merge
 * rewrite is a per-word `aggregate` fold. Only the single winning pair
 * crosses to the driver each round (1-row collect — control flow, like
 * the cluster-convergence probe), and `localCheckpoint` truncates the
 * per-round lineage so `merges` rounds never stack `merges` plans.
 *
 * Determinism: ties on pair count break on (left, right) symbol order, so
 * the learned merge list is a pure function of the corpus.
 */
object Bpe {

  /** One learned merge: rank-th most frequent pair at its round, with count. */
  case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Per-character initial symbols of a word (no empty symbols). */
  private[ops] def charSymbols(w: Column): Column =
    filter(split(w, ""), s => s =!= "")

  /**
   * Greedy left-to-right merge of adjacent `(a, b)` symbol pairs — one
   * `aggregate` fold (codegen, no UDF): carry the pending symbol; when
   * `(pending, next) == (a, b)` emit the merged symbol and clear, else
   * flush pending. Exactly canonical BPE greedy semantics, including
   * overlapping runs of an identical-pair ("aaaa" with (a,a) -> aa, aa;
   * "aaaaa" -> aa, aa, a).
   */
  private[ops] def mergePair(symbols: Column, a: String, b: String): Column = {
    val empty = array().cast("array<string>")
    val init = struct(empty.as("out"), lit(null).cast("string").as("pend"))
    def flushed(acc: Column): Column =
      when(acc.getField("pend").isNotNull,
        concat(acc.getField("out"), array(acc.getField("pend"))))
        .otherwise(acc.getField("out"))
    aggregate(
      symbols,
      init,
      (acc, x) =>
        when(acc.getField("pend") === a && x === b,
          struct(concat(acc.getField("out"), array(lit(a + b))).as("out"),
            lit(null).cast("string").as("pend")))
          .otherwise(struct(flushed(acc).as("out"), x.as("pend"))),
      acc => flushed(acc))
  }

  /** Adjacent-pair counts of a `(symbols, wc)` vocabulary: `(left, right, cnt)`. */
  private[ops] def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("symbols")) >= 2)
      .select(col("wc"), explode(transform(
        sequence(lit(1), size(col("symbols")) - 1),
        i => struct(element_at(col("symbols"), i).as("l"),
          element_at(col("symbols"), i + 1).as("r")))).as("p"))
      .select(col("p.l").as("left"), col("p.r").as("right"), col("wc"))
      .groupBy(col("left"), col("right")).agg(sum(col("wc")).cast("long").as("cnt"))

  /**
   * Learn `numMerges` ordered merges from the corpus. Stops early when no
   * pair occurs at least `minCount` times (vocab fully merged or corpus
   * exhausted).
   *
   * Checkpointing as in [[Dedup.duplicateClusters]]: each round's vocab is
   * NOT recomputable from source once lineage is truncated, and with
   * `checkpointDir` unset the checkpoints are LOCAL (executor block
   * storage) — fastest, fine on `local[*]`, but on a large cluster losing
   * one executor mid-training kills the job. Set `checkpointDir` to a
   * reliable filesystem path for long merge runs on real clusters; rounds
   * then pay one distributed write each (of the VOCABULARY, not the
   * corpus) but survive executor loss.
   */
  def learn(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minCount: Long = 2L,
      checkpointDir: Option[String] = None): Seq[Merge] = {
    require(numMerges > 0, "numMerges must be positive")
    require(minCount >= 1, "minCount must be at least 1")
    checkpointDir.foreach(df.sparkSession.sparkContext.setCheckpointDir)
    def materialize(d: DataFrame): DataFrame =
      if (checkpointDir.isDefined) d.checkpoint(eager = true)
      else d.localCheckpoint(eager = true)
    var words = materialize(df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(charSymbols(col("w")).as("symbols"), col("wc"))
    ) // the ONLY corpus-sized pass; vocab-sized after
    val learned = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = pairCounts(words)
        .filter(col("cnt") >= minCount)
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(1)
        .collect() // 1 row: the round's winner — driver control flow only
      top.headOption match {
        case Some(row) =>
          val (a, b, cnt) = (row.getString(0), row.getString(1), row.getLong(2))
          learned += Merge(rank, a, b, cnt)
          words = materialize(words
            .select(mergePair(col("symbols"), a, b).as("symbols"), col("wc"))
          ) // truncate the per-round lineage
          rank += 1
        case None => exhausted = true
      }
    }
    learned.result()
  }

  /**
   * Tokenize with a learned merge list: per-char symbols, then each merge
   * applied in rank order — a chain of `aggregate` folds, all codegen.
   * The column form of the tokenizer the merges define; the token COUNT
   * per doc is `size(applyMerges(...))`.
   */
  def applyMerges(word: Column, merges: Seq[Merge]): Column =
    applyMergePairs(word, merges.sortBy(_.rank).map(m => (m.left, m.right)))

  /** [[applyMerges]] over bare `(left, right)` pairs, already in rank order. */
  def applyMergePairs(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(charSymbols(word)) { case (sym, (a, b)) => mergePair(sym, a, b) }
}
