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

  /**
   * EXACT edit-distance (Levenshtein) join: all `(id_a, id_b, dist)` with
   * `dist <= maxDist` — the record-linkage / fuzzy-match primitive
   * (product titles, names, OCR noise, recrawled URLs).
   *
   * Never all-pairs: PassJoin-style segment blocking (Li, Deng, Feng 2011,
   * the public pass-join recipe — their tighter position windows are
   * replaced by the simpler ±maxDist superset, which keeps the candidate
   * rule one filter). Each left string of length `l >= maxDist + 1` is cut
   * into `maxDist + 1` even segments. In any alignment with at most
   * `maxDist` edits, each edit touches at most one segment, so by
   * pigeonhole at least one segment survives UNEDITED and appears verbatim
   * in the right string, shifted by at most `maxDist` positions (the net
   * insertions minus deletions before it). The right side therefore
   * enumerates every substring a surviving segment could be — for each
   * left length within `±maxDist` of its own, each segment index, each
   * shift in `[-maxDist, maxDist]` — and candidates come from ONE
   * `(segment index, left length, substring)` equi-join, then verify with
   * a threshold-bounded `levenshtein` (early-exit band DP). Strings
   * shorter than `maxDist + 1` cannot be segmented and fall into one
   * shared short-block key (they only pair with right strings of length
   * `<= 2 * maxDist` — a bounded set by construction).
   *
   * The probe enumeration is `O((2d+1)^2 * (d+1))` substrings per row
   * (d = `maxDist`, deduplicated before the join) — per-row codegen'd
   * higher-order functions, no shuffle until the candidate equi-join.
   *
   * **Block density is the scale hazard** — the same one as LSH hot
   * buckets, and it gets the same two-knob treatment
   * ([[Dedup.lshCandidatePairs]]'s `maxBucket`/`saltHotBuckets`): when a
   * corpus concentrates on few segment blocks (templated titles, shared
   * product names, or simply a segment alphabet the corpus saturates —
   * e.g. hex trigrams cap at 4096 keys, so blocks grow LINEARLY with rows
   * and the within-block candidate count QUADRATICALLY), the blocked join
   * stops being linear. A block of `b` build rows x `p` probe rows emits
   * `b*p` candidates on one reducer key.
   *
   *  - `maxBlock` (default unbounded: bit-identical to the uncapped
   *    join, which is what the naive-oracle exactness proof checks):
   *    build-side blocks — `(segment index, left length, segment)` keys
   *    with more than `maxBlock` LEFT rows — are DROPPED before the
   *    candidate join. Cheap and linear, but a RECALL LOSS: a true pair
   *    whose every surviving segment falls in hot blocks is never
   *    proposed (JoinsSpec measures the loss on a dense-block corpus).
   *  - `saltHotBlocks = true`: keep hot blocks and pair them via a salted
   *    join (deterministic per-id salt, each pair produced exactly once):
   *    hot LEFT rows take salt `hash(id) mod nsalt`
   *    (`nsalt = ceil(block_n / maxBlock)`), hot probe rows replicate
   *    across the salts, so no reducer key sees more than `~maxBlock`
   *    build rows however hot the block. Zero recall loss; the replicated
   *    shuffle volume is bounded by the candidate output the block was
   *    always going to emit — you pay for the pairs you asked to keep,
   *    spread evenly, instead of one straggling reducer.
   *
   * The hot-key frame is an AGGREGATED `(i, l, seg)` frame with at most
   * `rows / maxBlock` entries by construction, so it broadcasts at any
   * corpus size; cold rows route through a broadcast anti-join, never a
   * shuffle on the raw frame.
   *
   * **`redundancy = 2` — pair-segment blocking for saturated segment
   * alphabets** (round 19, the PartEnum-style selectivity knob: Arasu,
   * Ganti, Kaushik, VLDB 2006's partition-enumeration signatures, in
   * PassJoin's even-segment form): block density is only half the
   * story — on short strings the segments themselves are short (10-char
   * hex keys at `maxDist = 2` give ~3-char segments, a 4096-key
   * alphabet), so blocks are UNIFORMLY dense and the cap/salt knobs
   * have no skew to work with. `redundancy = 2` cuts each string into
   * `k = maxDist + 2` segments instead of `maxDist + 1`; at most
   * `maxDist` segments are touched by edits, so at least TWO survive
   * unedited, and the block key becomes an (i < j) segment PAIR —
   * roughly doubling the key's bits and dropping random-collision
   * candidates quadratically. The probe side enumerates shift pairs
   * `(si, sj)` with `|si| + |sj - si| + |delta - sj| <= maxDist` (the
   * three terms bound the net indels before segment i, between the
   * segments, and after segment j — the groups partition the edit
   * budget). Exact like the default — the naive-oracle hash match is
   * the proof — at the price of `C(k, 2)` build keys and a larger probe
   * enumeration per row, which buys orders of magnitude fewer
   * candidates whenever the single-segment alphabet saturates. Default
   * `redundancy = 1` is bit-identical to the pre-round-19 plan.
   *
   * Candidates then pass a LOSSLESS q-gram count prefilter (round 19 —
   * the count-filtering principle of Gravano et al., VLDB 2001, hashed
   * into a 64-bit bigram bitmap per string, built once per input row)
   * before the distinct + verify: one edit operation rewrites at most
   * q = 2 of a string's positionally-overlapping bigrams, so at most
   * `2 * maxDist` distinct bigram TYPES of either string can be absent
   * from the other — `|D(a) ∩ D(b)| >= |D(a)| - 2*maxDist` (and
   * symmetrically for `b`). Any hash only MERGES types, shrinking the
   * left and right of the inequality together
   * (`|bits(a) ∩ bits(b)| >= popcount(a) - |D(a) \ D(b)|`), so
   * `bit_count(bm_a & bm_b) >= greatest(popcount) - 2*maxDist` can never
   * reject a true pair — the naive-oracle hash matches are untouched at
   * every scale. What it does reject is the blocked join's residue:
   * random same-segment collisions share ~`g²/64` expected bits (g =
   * grams per string), so on a saturated segment alphabet — where block
   * density makes candidates quadratic — almost every false candidate
   * dies on two codegen'd integer ops instead of reaching the
   * shuffle-heavy distinct and the band DP.
   *
   * `ids` must be unique per side (they key the verify re-join). Null
   * strings never match. Output: `(id_a, id_b, dist)`, `dist` exact.
   */
  def editDistanceJoin(
      left: DataFrame,
      leftId: String,
      leftStr: String,
      right: DataFrame,
      rightId: String,
      rightStr: String,
      maxDist: Int,
      maxBlock: Int = Int.MaxValue,
      saltHotBlocks: Boolean = false,
      redundancy: Int = 1): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(maxBlock > 0, s"maxBlock must be positive, got $maxBlock")
    require(redundancy == 1 || redundancy == 2,
      s"redundancy must be 1 or 2, got $redundancy")
    val d = maxDist
    val k = d + redundancy
    // hashed bigram bitmap per input string (for the lossless count
    // prefilter below): bit `hash(bigram) mod 64` per distinct bigram
    def gramBitmap(c: String): Column = expr(
      s"""CASE WHEN length($c) < 2 THEN CAST(0 AS BIGINT)
          ELSE aggregate(transform(sequence(1, length($c) - 1),
            j -> shiftleft(CAST(1 AS BIGINT), pmod(hash(substring($c, j, 2)), 64))),
            CAST(0 AS BIGINT), (acc, x) -> acc | x) END""")
    // the per-row key enumeration below is the operator's CPU: if the
    // input scan under-partitions (a single small parquet file arrives
    // as ONE partition however many cores the session has — sf1
    // measured the whole probe enumeration serializing onto one core,
    // 122 s where the cluster-shaped plan takes seconds), spread it
    // with a round-robin repartition first. Guarded, so well-partitioned
    // cluster inputs are never reshuffled.
    def spread(df: DataFrame): DataFrame = {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < p) df.repartition(p) else df
    }
    val la = spread(left.select(col(leftId).as("id_a"), col(leftStr).as("__sa"))
      .where(col("__sa").isNotNull))
      .withColumn("__bma", gramBitmap("__sa"))
    val rb = spread(right.select(col(rightId).as("id_b"), col(rightStr).as("__sb"))
      .where(col("__sb").isNotNull))
      .withColumn("__bmb", gramBitmap("__sb"))

    // build side: (segment index, own length, segment text) per row —
    // short strings (< k chars) take the single shared short-block key.
    // The string itself rides along: linkage keys are short (names,
    // titles, URLs), so carrying them through the candidate join is
    // cheaper than two id-keyed re-joins before the verify.
    def buildSeg(s: String, i: String, l: String): String =
      s"""substring($s, CAST($i * $l DIV $k AS INT) + 1,
          CAST(($i + 1) * $l DIV $k - $i * $l DIV $k AS INT))"""
    val buildKeysExpr =
      if (redundancy == 1)
        s"""CASE WHEN __l < $k THEN array(struct(-1 AS i, '' AS seg))
            ELSE transform(sequence(0, $d), i -> struct(
              i AS i, ${buildSeg("__sa", "i", "__l")} AS seg)) END"""
      else
        // redundancy = 2: one key per unordered segment PAIR (i < j),
        // indices packed as `i * k + j`, contents concatenated — the
        // concat is unambiguous because both segment lengths are fixed
        // functions of (i, j, l)
        s"""CASE WHEN __l < $k THEN array(struct(-1 AS i, '' AS seg))
            ELSE flatten(transform(sequence(0, ${k - 2}), i ->
              transform(sequence(i + 1, ${k - 1}), j -> struct(
                i * $k + j AS i,
                concat(${buildSeg("__sa", "i", "__l")},
                  ${buildSeg("__sa", "j", "__l")}) AS seg)))) END"""
    val segs = la
      .withColumn("__l", length(col("__sa")))
      .withColumn("__seg", explode(expr(buildKeysExpr)))
      .select(col("id_a"), col("__sa"), col("__bma"), col("__seg.i").as("i"),
        col("__l").as("l"), col("__seg.seg").as("seg"))

    // probe side: every substring a surviving segment could be, for every
    // compatible left length — guarded so `sequence` never runs backwards.
    // The shift window is the multi-match-aware bound: with e_pre edits
    // before the surviving segment and e_post after, shift = net prefix
    // length change (|shift| <= e_pre), delta - shift = net suffix change
    // (|delta - shift| <= e_post), and e_pre + e_post <= maxDist — so only
    // shifts with |shift| + |delta - shift| <= maxDist can occur (for
    // equal lengths that's |shift| <= maxDist/2, not maxDist)
    def probeSeg(idx: String, sh: String): String =
      s"""substring(__sb, CAST($idx * l DIV $k + $sh AS INT) + 1,
          CAST(($idx + 1) * l DIV $k - $idx * l DIV $k AS INT))"""
    def probeInBounds(idx: String, sh: String): String =
      s"""$idx * l DIV $k + $sh >= 0
          AND $idx * l DIV $k + $sh + (($idx + 1) * l DIV $k - $idx * l DIV $k) <= __m"""
    // probe keys for build lengths that don't exist can never match —
    // prune them with a broadcast semi-join against the build side's
    // distinct-length frame (at most maxLen entries, broadcastable at
    // any corpus size) BEFORE the candidate shuffle (redundancy = 1) or
    // even before the pair/shift enumeration (redundancy = 2, where the
    // per-length enumeration is the larger constant). On a fixed-length
    // corpus this cuts the enumerated 2d+1 length lanes to one.
    val buildLengths = broadcast(
      la.select(length(col("__sa")).as("l")).distinct())
    val probeKeys =
      if (redundancy == 1) rb
        .withColumn("__m", length(col("__sb")))
        .withColumn("__key", explode(expr(
          s"""array_distinct(concat(
              CASE WHEN __m + $d >= greatest(__m - $d, $k) THEN
                flatten(flatten(transform(sequence(greatest(__m - $d, $k), __m + $d), l ->
                  transform(sequence(0, $d), i ->
                    filter(transform(sequence(-$d, $d), sh ->
                      CASE WHEN abs(sh) + abs((__m - l) - sh) <= $d
                            AND ${probeInBounds("i", "sh")}
                           THEN struct(i AS i, l AS l, ${probeSeg("i", "sh")} AS seg)
                           ELSE NULL END), x -> x IS NOT NULL)))))
              ELSE array() END,
              CASE WHEN least(${k - 1}, __m + $d) >= greatest(__m - $d, 0) THEN
                transform(sequence(greatest(__m - $d, 0), least(${k - 1}, __m + $d)), l ->
                  struct(-1 AS i, l AS l, '' AS seg))
              ELSE array() END))""")))
        .select(col("id_b"), col("__sb"), col("__bmb"), col("__key.i").as("i"),
          col("__key.l").as("l"), col("__key.seg").as("seg"))
        .join(buildLengths, Seq("l"), "left_semi")
      else {
        // redundancy = 2: explode candidate left LENGTHS first and
        // length-prune before the pair/shift enumeration runs — the
        // enumeration then pays only for length lanes that exist on the
        // build side. For each pair (i < j) and each feasible shift pair:
        // |si| bounds the net indels before segment i, |sj - si| those
        // between the segments, |delta - sj| those after segment j; the
        // three edit groups share the maxDist budget, hence the triangle
        // sum. No array_distinct: the pair-level distinct before the
        // verify already collapses duplicate candidates, and O(n²)
        // struct dedup per row costs more than the duplicates do.
        rb.withColumn("__m", length(col("__sb")))
          .withColumn("l", explode(expr(s"sequence(greatest(__m - $d, 0), __m + $d)")))
          .join(buildLengths, Seq("l"), "left_semi")
          .withColumn("__key", explode(expr(
            s"""CASE
                WHEN l < $k AND l <= ${k - 1} THEN array(struct(-1 AS i, '' AS seg))
                WHEN l >= $k THEN
                  flatten(flatten(transform(sequence(0, ${k - 2}), i ->
                    transform(sequence(i + 1, ${k - 1}), j ->
                      filter(flatten(transform(sequence(-$d, $d), si ->
                        transform(sequence(greatest(si - $d, -$d), least(si + $d, $d)), sj ->
                          CASE WHEN abs(si) + abs(sj - si) + abs((__m - l) - sj) <= $d
                                AND ${probeInBounds("i", "si")}
                                AND ${probeInBounds("j", "sj")}
                               THEN struct(i * $k + j AS i,
                                 concat(${probeSeg("i", "si")},
                                   ${probeSeg("j", "sj")}) AS seg)
                               ELSE NULL END))),
                        x -> x IS NOT NULL)))))
                ELSE array() END""")))
          .select(col("id_b"), col("__sb"), col("__bmb"), col("__key.i").as("i"),
            col("l"), col("__key.seg").as("seg"))
      }

    val candidates =
      if (maxBlock == Int.MaxValue) segs.join(probeKeys, Seq("i", "l", "seg"))
      else {
        // aggregated build-side block sizes: <= rows/maxBlock hot keys by
        // construction, so the hot-key frame broadcasts at any scale
        val blockKey = Seq("i", "l", "seg")
        val hotKeys = segs.groupBy(blockKey.map(col): _*)
          .agg(count(lit(1)).as("__block_n"))
          .filter(col("__block_n") > maxBlock)
        val coldCand = segs
          .join(broadcast(hotKeys.select(blockKey.map(col): _*)),
            blockKey, "left_anti")
          .join(probeKeys, blockKey)
        if (!saltHotBlocks) coldCand
        else {
          val hk = broadcast(hotKeys.withColumn("__nsalt",
            ceil(col("__block_n").cast("double") / maxBlock).cast("int"))
            .select(col("i"), col("l"), col("seg"), col("__nsalt")))
          val hotSegs = segs.join(hk, blockKey)
            .withColumn("__salt", pmod(hash(col("id_a")), col("__nsalt")))
            .drop("__nsalt")
          val hotProbe = probeKeys.join(hk, blockKey)
            .withColumn("__salt", explode(sequence(lit(0), col("__nsalt") - 1)))
            .drop("__nsalt")
          coldCand.unionByName(
            hotSegs.join(hotProbe, blockKey :+ "__salt").drop("__salt"))
        }
      }
    // lossless bigram-count prefilter (see scaladoc) BEFORE the distinct:
    // random same-segment collisions die on two integer ops and never
    // reach the pair shuffle or the DP
    val prefiltered = candidates.where(expr(
      s"""bit_count(__bma & __bmb) >=
          greatest(bit_count(__bma), bit_count(__bmb)) - ${2 * d}"""))
    // distinct BEFORE verify: a pair found through several surviving
    // segments must pay the levenshtein DP once, not once per segment
    prefiltered
      .select(col("id_a"), col("id_b"), col("__sa"), col("__sb")).distinct()
      .withColumn("dist", levenshtein(col("__sa"), col("__sb"), d).cast("long"))
      .where(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /**
   * Mutual-best (reciprocal) matching over a scored candidate-pair frame
   * — the entity-resolution acceptance rule that stops one hub record
   * from absorbing everything: a pair survives iff `b` is `a`'s
   * highest-scoring partner AND `a` is `b`'s. Run it downstream of any
   * pair generator here or in [[Dedup]] (edit-distance, LSH, containment)
   * with an integer score (ppm similarity, negated distance). Ties break
   * by SMALLEST partner on each side — a total order, so the verdict is
   * a pure function of the pair frame (an arbitrary-tie argmax would
   * make matches flap run to run). Duplicate (a, b) rows are fine (the
   * argmax sees the pair once per row at the same score). Output:
   * `(aCol, bCol, scoreCol)` for the surviving pairs.
   *
   * Two map-side-combined argmax aggs (one per side) + ONE equi-join of
   * the two best-partner frames, each at most one row per key — never a
   * self-join of the pair frame. At 100 TB of candidate pairs the aggs
   * collapse to key-sized frames before the join.
   */
  def mutualBest(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      scoreCol: String): DataFrame = {
    val s = col(scoreCol).cast("long")
    def bestFor(keyCol: String, partnerCol: String) =
      pairs.where(col(keyCol).isNotNull && col(partnerCol).isNotNull && s.isNotNull)
        .groupBy(col(keyCol))
        .agg(min_by(struct(col(partnerCol).as("p"), s.as("s")),
          struct((-s).as("ns"), col(partnerCol).as("p"))).as("__best"))
        .select(col(keyCol), col("__best.p").as(s"__best_$keyCol"),
          col("__best.s").as(s"__s_$keyCol"))
    bestFor(aCol, bCol)
      .join(bestFor(bCol, aCol),
        col(s"__best_$aCol") === col(bCol) && col(s"__best_$bCol") === col(aCol))
      .select(col(aCol), col(bCol), col(s"__s_$aCol").as(scoreCol))
  }
}
