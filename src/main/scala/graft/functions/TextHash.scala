package graft.functions

import java.util.Locale

import org.apache.spark.sql.{Column, GraftExpressionBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native text-hashing kernels for the dedup/fingerprint operators.
 *
 * The same math is expressible with `transform`/`aggregate` higher-order
 * functions (and the DuckDB oracles mirror exactly that formulation), but
 * Catalyst evaluates lambda bodies interpreted, one boxed element at a time —
 * profiled at ~30x slower than these single-pass loops. Each expression here
 * digests every shingle/token exactly once with a thread-local MessageDigest
 * and participates in whole-stage codegen via a static call.
 *
 * Semantics are bit-identical to the SQL formulation (verified by spec
 * cross-checks and the driver's DuckDB oracle):
 * tokens = non-empty runs of `[a-z0-9]` in the lowercased text.
 */
object TextHash {
  private val tokenSplit = "[^a-z0-9]+"
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val HexChars = "0123456789abcdef".toCharArray

  def md5Hex(s: String): String = {
    val md = digests.get()
    md.reset()
    val bytes = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  // Locale note (round 20): the kernels lowercase with Locale.ROOT, while
  // their composed spec twins use Spark's lower() (UTF8String casing,
  // which is locale-independent but not identical to a tr/az JVM-default
  // toLowerCase — e.g. 'I' lowers to dotless 'ı' under a Turkish default
  // locale). The documented "bit-identical" parity therefore assumes a
  // non-tr/az environment OR, as here, a locale-pinned kernel: Locale.ROOT
  // matches lower()'s behavior on every shape the parity specs and the
  // oracle exercise, and keeps the kernel itself independent of the host
  // JVM's default locale.
  def tokenize(text: String): Array[String] =
    text.toLowerCase(Locale.ROOT).split(tokenSplit, -1).filter(_.nonEmpty)

  /** [[tokenize]] as ArrayData — the eval body of the [[Tokenize]] kernel
    * (`TextAnalysis.tokens`' hot form: the composed
    * `filter(split(lower(...)))` evaluates its filter lambda interpreted,
    * per element, at every explode site in the battery). */
  def tokenizeArray(text: UTF8String): ArrayData = {
    val toks = tokenize(text.toString)
    val out = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  /**
   * Multiset stopword-profile hit counts in ONE tokenize pass: for each
   * token, a hash lookup adds 1 to every profile containing the word.
   * Bit-identical to folding `aggregate(tokens, zero, acc + one_hot(t))`
   * per profile (TextAnalysis.stopwordPickComposed / stopwordHits — whose
   * higher-order lambdas are CodegenFallback and pay a per-TOKEN linear
   * scan of the literal word map plus a fresh boxed accumulator array),
   * pinned by TextAnalysisSpec parity.
   */
  def stopwordScores(
      text: UTF8String,
      lookup: java.util.HashMap[String, Array[Int]],
      width: Int): ArrayData = {
    val toks = tokenize(text.toString)
    val acc = new Array[Long](width)
    var i = 0
    while (i < toks.length) {
      val idx = lookup.get(toks(i))
      if (idx != null) {
        var j = 0
        while (j < idx.length) { acc(idx(j)) += 1L; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  /**
   * Character class for [[scriptTokenize]]: 1 = word scripts (space- or
   * separator-delimited: ASCII alphanumerics plus Greek/Cyrillic, Hebrew,
   * Arabic, Devanagari, Hangul — the BMP ranges of
   * `TextAnalysis.ScriptRanges`), 2 = segmentation scripts written WITHOUT
   * word spaces (Thai, kana, Han), 0 = separator. Surrogate halves (all
   * supplementary-plane text) fall in no range, matching the code-point
   * semantics of the regex twin.
   */
  private def scriptCharClass(c: Char): Int =
    if (c < 0x80) {
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        (c >= 'A' && c <= 'Z')) 1 else 0
    } else if (c >= 0x0370 && c <= 0x04ff) 1      // grek + cyrl (contiguous)
    else if (c >= 0x0590 && c <= 0x05ff) 1        // hebr
    else if (c >= 0x0600 && c <= 0x06ff) 1        // arab
    else if (c >= 0x0900 && c <= 0x097f) 1        // deva
    else if (c >= 0xac00 && c <= 0xd7a3) 1        // hang
    else if (c >= 0x0e00 && c <= 0x0e7f) 2        // thai
    else if (c >= 0x3040 && c <= 0x30ff) 2        // kana
    else if (c >= 0x4e00 && c <= 0x9fff) 2        // hani
    else 0

  /**
   * Script-aware tokenization — the upgrade over [[tokenize]] for
   * multilingual corpora, where the ASCII tokenizer sees NOTHING in the
   * ~10 non-Latin scripts the language-ID routes (CJK text tokenizes to
   * zero tokens; quality gates, shingles and TF vectors silently mis-score
   * a third of a real crawl):
   *
   *  - runs of WORD-script characters (ASCII alphanumerics — uppercase
   *    folded to lowercase — plus Greek, Cyrillic, Hebrew, Arabic,
   *    Devanagari, Hangul) emit one token per run. Only ASCII is
   *    case-folded: non-ASCII case law differs between engines
   *    (final sigma, dotted I), so leaving it untouched is what keeps
   *    results bit-identical everywhere;
   *  - runs of SEGMENTATION-script characters (Han, kana, Thai — scripts
   *    written without word spaces) emit overlapping CHARACTER BIGRAMS
   *    (the standard public recipe for CJK indexing and n-gram LMs: CJK
   *    words average ~2 chars, so bigrams approximate words without a
   *    dictionary); a lone character emits itself. Han and kana segment as
   *    ONE run (Japanese prose interleaves them mid-word);
   *  - everything else separates.
   */
  def scriptTokenize(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = text.length
    var start = 0
    var cls = 0
    def flush(end: Int): Unit =
      if (cls == 1) {
        val sb = new java.lang.StringBuilder(end - start)
        var i = start
        while (i < end) {
          val c = text.charAt(i)
          sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
          i += 1
        }
        out += sb.toString
      } else if (cls == 2) {
        if (end - start == 1) out += text.substring(start, end)
        else {
          var i = start
          while (i < end - 1) {
            out += text.substring(i, i + 2)
            i += 1
          }
        }
      }
    var i = 0
    while (i < n) {
      val c = scriptCharClass(text.charAt(i))
      if (c != cls) {
        flush(i)
        start = i
        cls = c
      }
      i += 1
    }
    flush(n)
    out.toArray
  }

  /** [[scriptTokenize]] as an array column value. */
  def scriptTokens(text: UTF8String): ArrayData =
    new GenericArrayData(
      scriptTokenize(text.toString).map(UTF8String.fromString(_): AnyRef))

  /**
   * Tokenizer switch shared by every hashing kernel: the ASCII [[tokenize]]
   * by default (bit-compatible with all existing signatures and oracles),
   * [[scriptTokenize]] when `scriptAware` — the flag multilingual corpora
   * need, because under the ASCII tokenizer a CJK/Thai document yields ZERO
   * tokens, so every such document gets the SAME degenerate signature
   * (one empty shingle / an all-zero vector) and near-dedup would collapse
   * an entire language into one duplicate cluster.
   */
  private def tokensOf(text: String, scriptAware: Boolean): Array[String] =
    if (scriptAware) scriptTokenize(text) else tokenize(text)

  /** Word `words`-gram shingle starting at token `i`, space-joined. */
  private def appendShingle(sb: java.lang.StringBuilder, toks: Array[String], i: Int, words: Int): Unit = {
    sb.setLength(0)
    val end = math.min(i + words, toks.length)
    var w = i
    while (w < end) {
      if (w > i) sb.append(' ')
      sb.append(toks(w))
      w += 1
    }
  }

  /**
   * MinHash signature over word `words`-gram shingles: component `j` is the
   * minimum of `substring(md5(shingle || ':' || j/4), (j%4)*8, 8)` — four
   * signature components per digest (see [[graft.ops.Dedup.minhash]]).
   */
  def minhashSignature(text: UTF8String, numHashes: Int, words: Int, scriptAware: Boolean): ArrayData = {
    val toks = tokensOf(text.toString, scriptAware)
    val nWin = math.max(toks.length - (words - 1), 1)
    val blocks = (numHashes + 3) / 4
    val mins = new Array[String](numHashes)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nWin) {
      appendShingle(sb, toks, i, words)
      val shingle = sb.toString
      var b = 0
      while (b < blocks) {
        val hex = md5Hex(shingle + ":" + b)
        var k = 0
        while (k < 4 && b * 4 + k < numHashes) {
          val j = b * 4 + k
          val sub = hex.substring(k * 8, k * 8 + 8)
          if (mins(j) == null || sub.compareTo(mins(j)) < 0) mins(j) = sub
          k += 1
        }
        b += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_): AnyRef))
  }

  /** Word `words`-gram shingles (not deduplicated: every downstream use —
    * min, array_intersect, array_union — is multiset-safe). */
  def wordShingles(text: UTF8String, words: Int, scriptAware: Boolean): ArrayData = {
    val toks = tokensOf(text.toString, scriptAware)
    val nWin = math.max(toks.length - (words - 1), 1)
    val out = new Array[AnyRef](nWin)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nWin) {
      appendShingle(sb, toks, i, words)
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Adjacent space-joined word n-grams; EMPTY when the text has fewer
    * than `n` tokens — unlike [[wordShingles]], which clamps short docs to
    * one shingle, this matches the scorer contract where the word-count
    * quality gate (not the gram scorer) owns short documents. NULL text
    * null-propagates (the expression is a standard null-intolerant unary —
    * callers get null, NOT an empty array; explode drops both and ANSI
    * `size(null)` is null, so the current consumers agree either way).
    * Bit-identical to the composed-builtin form
    * `transform(sequence(1, size(toks)-n+1), i -> array_join(slice(toks,i,n),' '))`
    * over `tokens(text)` (the spec twin cross-check lives in
    * TextAnalysisSpec, next to the composed form). */
  def wordNgrams(text: UTF8String, n: Int, scriptAware: Boolean): ArrayData = {
    val toks = tokensOf(text.toString, scriptAware)
    val nWin = toks.length - (n - 1)
    if (nWin <= 0) new GenericArrayData(Array.empty[AnyRef])
    else {
      val out = new Array[AnyRef](nWin)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < nWin) {
        appendShingle(sb, toks, i, n)
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Winnowing-style rolling fingerprint: min md5 over word `window`-grams. */
  def rollingFingerprint(text: UTF8String, window: Int, scriptAware: Boolean): UTF8String = {
    val toks = tokensOf(text.toString, scriptAware)
    val nWin = math.max(toks.length - (window - 1), 1)
    var min: String = null
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nWin) {
      appendShingle(sb, toks, i, window)
      val hex = md5Hex(sb.toString)
      if (min == null || hex.compareTo(min) < 0) min = hex
      i += 1
    }
    UTF8String.fromString(min)
  }

  /** 32-bit SimHash: per-bit majority vote of md5 hex-digit parities. */
  def simhash32(text: UTF8String, scriptAware: Boolean): Long = {
    val toks = tokensOf(text.toString, scriptAware)
    val votes = new Array[Int](32)
    var t = 0
    while (t < toks.length) {
      val hex = md5Hex(toks(t))
      var j = 0
      while (j < 32) {
        votes(j) += (if ((Character.digit(hex.charAt(j), 16) & 1) == 1) 1 else -1)
        j += 1
      }
      t += 1
    }
    var value = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) value |= 1L << j
      j += 1
    }
    value
  }

  /**
   * 64-bit SimHash: bit `j`'s vote is bit `j%4` of md5 hex digit `j/4` —
   * 4 independent bits per digit, 64 bits from the first 16 digits of ONE
   * md5 per token (same digest count as [[simhash32]]). The wider
   * fingerprint exists for banding: 4 x 16-bit bands give 65536 bucket
   * values per band, vs 256 for byte-bands of the 32-bit hash — the
   * difference between bounded buckets and a quadratic candidate blow-up on
   * a large corpus. Bit 63 makes the value negative; Hamming distance and
   * band extraction are sign-agnostic (xor/shift/mask).
   */
  def simhash64(text: UTF8String, scriptAware: Boolean): Long = {
    val toks = tokensOf(text.toString, scriptAware)
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val hex = md5Hex(toks(t))
      var j = 0
      while (j < 64) {
        votes(j) += (if (((Character.digit(hex.charAt(j >> 2), 16) >> (j & 3)) & 1) == 1) 1 else -1)
        j += 1
      }
      t += 1
    }
    var value = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) value |= 1L << j
      j += 1
    }
    value
  }

  /**
   * Characters per Unicode-script class in ONE pass — the kernel behind
   * [[graft.ops.TextAnalysis.languageId]]'s script pre-filter, replacing
   * ten whole-string `regexp_replace` passes (each of which allocates a
   * stripped copy of the document) with a single char loop. Index order is
   * the contract with `TextAnalysis.ScriptRanges` (sorted keys): arab,
   * cyrl, deva, grek, hang, hani, hebr, kana, latn, thai. Bit-identical to
   * the composed form `length(text) - length(regexp_replace(text,
   * '[range]', ''))` per range: every range lies in the BMP, so char
   * counts equal Spark's code-point counts, and surrogate halves (the only
   * chars where they could differ) fall in no range.
   */
  def scriptCounts(text: UTF8String): ArrayData = {
    val s = text.toString
    val counts = new Array[Long](10)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x80) {
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) counts(8) += 1 // latn
      } else if (c >= 0x0370) {
        if (c <= 0x03ff) counts(3) += 1                       // grek
        else if (c <= 0x04ff) counts(1) += 1                  // cyrl
        else if (c >= 0x0590 && c <= 0x05ff) counts(6) += 1   // hebr
        else if (c >= 0x0600 && c <= 0x06ff) counts(0) += 1   // arab
        else if (c >= 0x0900 && c <= 0x097f) counts(2) += 1   // deva
        else if (c >= 0x0e00 && c <= 0x0e7f) counts(9) += 1   // thai
        else if (c >= 0x3040 && c <= 0x30ff) counts(7) += 1   // kana
        else if (c >= 0x4e00 && c <= 0x9fff) counts(5) += 1   // hani
        else if (c >= 0xac00 && c <= 0xd7a3) counts(4) += 1   // hang
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /**
   * Hashing-trick term-frequency vector in ONE pass: dimension
   * `parseInt(md5(token)[0:4], 16) % dims` accumulates 1.0 per token
   * occurrence — the classic featurizer that turns raw text into a
   * fixed-width vector with NO trained embedding model, so the whole
   * similarity/ANN stack runs on corpora that never saw an encoder.
   * Counts are small integers held in doubles (exact), and the md5-hex
   * dimension hash replays bit-identically in any engine (the same
   * first-16-bits-of-md5 convention as the sampling hash bucket).
   */
  def hashedTf(text: UTF8String, dims: Int, scriptAware: Boolean): ArrayData = {
    val toks = tokensOf(text.toString, scriptAware)
    val counts = new Array[Double](dims)
    var i = 0
    while (i < toks.length) {
      counts(Integer.parseInt(md5Hex(toks(i)).substring(0, 4), 16) % dims) += 1.0
      i += 1
    }
    new GenericArrayData(counts)
  }

  /**
   * Unicode normalization via `java.text.Normalizer` (JDK, zero deps) —
   * the canonical first pass of every text pipeline: composed vs
   * decomposed accents (NFC/NFD) and compatibility folds (NFKC/NFKD:
   * fullwidth forms, ligatures, superscripts) otherwise make byte-equal
   * comparisons — exact dedup, fingerprints, token counts — silently miss
   * equivalent text. The already-normalized fast path (the overwhelming
   * majority of real text) returns the input without allocating.
   */
  def unicodeNormalize(text: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, f)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }

  /**
   * Sentence-boundary chunking in ONE character scan — the codegen'd twin
   * of [[graft.ops.TextAnalysis.chunkBySentences]]'s composed form (which
   * remains as the oracle-shaped specification; parity is spec-pinned):
   *
   *  - sentences are the non-overlapping matches of
   *    `[^.!?]+[.!?]+|[^.!?]+$` in match order — a run of non-terminators
   *    plus its terminator run, or the trailing unterminated fragment;
   *    leading terminator characters between matches belong to no sentence
   *    (the regex can't start a match on one), exactly as the regex scans;
   *  - each sentence's START offset in the concatenated sentence stream
   *    (code points, Spark's `length`) lands it in primary offset window
   *    `p = o / step` (`step = maxChars - overlap`) and ALSO in `p - 1`
   *    when `o % step < overlap` (the boundary-straddling repeat);
   *  - offset windows containing no sentence start are never created, so
   *    empty chunks are dropped without a post-filter.
   *
   * Window ids created while scanning are strictly increasing: within one
   * window, remainders grow with the offset, so if a later sentence
   * straddles back into `p - 1`, the window's earlier sentences (smaller
   * remainder) already did — a flat builder list with a short backward
   * probe replaces any map. The composed form pays O(sentences × chunks)
   * interpreted-lambda evals per row; this is O(chars).
   *
   * Returns `array<struct<chunk_id:long, chunk_text:string>>`; no
   * sentences (empty / all-terminator text) yields an empty array (the
   * caller's `explode` then drops the row, matching the composed form's
   * `size > 0` filter).
   */
  def sentenceChunks(text: UTF8String, maxChars: Int, overlap: Int): ArrayData = {
    val step = maxChars - overlap
    val s = text.toString
    val n = s.length
    @inline def isTerm(c: Char): Boolean = c == '.' || c == '!' || c == '?'
    val ids = new java.util.ArrayList[java.lang.Long]()
    val sbs = new java.util.ArrayList[java.lang.StringBuilder]()
    def appendTo(id: Long, str: String, from: Int, until: Int): Unit = {
      // window ids are strictly increasing and only p and p-1 are ever
      // targeted, so a hit can only sit in the LAST TWO entries — probing
      // further keeps per-window cost O(1) instead of O(windows) on long
      // documents
      val sz = ids.size()
      var k = -1
      if (sz >= 1 && ids.get(sz - 1).longValue() == id) k = sz - 1
      else if (sz >= 2 && ids.get(sz - 2).longValue() == id) k = sz - 2
      if (k >= 0) sbs.get(k).append(str, from, until)
      else {
        ids.add(java.lang.Long.valueOf(id))
        sbs.add(new java.lang.StringBuilder().append(str, from, until))
      }
    }
    var i = 0
    var offset = 0L // code-point offset in the sentence stream
    while (i < n) {
      if (isTerm(s.charAt(i))) i += 1 // unmatched inter-sentence terminator
      else {
        val start = i
        while (i < n && !isTerm(s.charAt(i))) i += 1
        while (i < n && isTerm(s.charAt(i))) i += 1
        val p = offset / step
        if (offset % step < overlap && p >= 1) appendTo(p - 1, s, start, i)
        appendTo(p, s, start, i)
        offset += s.codePointCount(start, i)
      }
    }
    val out = new Array[Any](ids.size())
    var k = 0
    while (k < out.length) {
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](ids.get(k).longValue(), UTF8String.fromString(sbs.get(k).toString)))
      k += 1
    }
    new GenericArrayData(out)
  }

  /**
   * PII card scan — candidate extraction + Luhn checksum + masking in ONE
   * character pass, the native twin of the composed
   * `TextAnalysis.cardCandidates` / `validCardNumbers` /
   * `scrubCardNumbers` chain (regex extract + per-digit higher-order
   * Luhn fold + replace fold — profiled as the battery's largest
   * remaining per-row CPU at the sf1 decade). Returns
   * `struct<cands: array<string>, valid: array<string>, scrubbed: string>`.
   *
   * Semantics are BIT-IDENTICAL to the composed regex form (parity spec
   * over adversarial shapes + property soup), including the Java-regex
   * matching quirks the scaladoc there documents:
   *
   *  - a candidate is 13-19 digits with at most one space/dash between
   *    digits, its left boundary the string start or one char outside
   *    `[0-9-]`, its right boundary one char outside `[0-9-]` or the end;
   *  - matching is leftmost, GREEDY WITH BACKTRACKING: at each attempt
   *    the longest digit count in [13, 19] whose following character is a
   *    legal right boundary wins (so an over-long SPACE-separated run can
   *    yield a 13+-digit prefix — the separator doubles as the boundary —
   *    while an unbroken 20-digit run never matches);
   *  - boundaries are CONSUMED: two candidate runs separated by a single
   *    character miss the second — the documented cost of the
   *    lookaround-free, engine-portable pattern;
   *  - astral boundary characters consume one CODE POINT (two chars),
   *    matching the regex engine's code-point stepping.
   *
   * Masking replays `aggregate(valid, text, replace)` exactly: each
   * Luhn-valid candidate is literally globally replaced with `<CARD>`, in
   * candidate order, each replace operating on the previous result.
   */
  def cardScan(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val n = s.length
    @inline def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
    @inline def isSep(c: Char): Boolean = c == ' ' || c == '-'
    @inline def isBoundary(c: Char): Boolean = !isDigit(c) && c != '-' // [^0-9-]
    // end index (exclusive) of the group-2 match whose run starts at `rs`,
    // or -1: parse the digit chain (one optional sep between digits),
    // record the position after each of the first 19 digits, then take the
    // LONGEST n in [13, 19] whose next char is a legal right boundary
    val ends = new Array[Int](20)
    def tryRun(rs: Int): Int = {
      if (rs >= n || !isDigit(s.charAt(rs))) return -1
      var i = rs
      var d = 0
      while (i < n && isDigit(s.charAt(i)) && d < 19) {
        d += 1; ends(d) = i + 1; i += 1
        if (d < 19 && i + 1 < n && isSep(s.charAt(i)) && isDigit(s.charAt(i + 1))) i += 1
      }
      var nn = d
      while (nn >= 13) {
        val e = ends(nn)
        if (e == n || isBoundary(s.charAt(e))) return e
        nn -= 1
      }
      -1
    }
    val cands = new java.util.ArrayList[String]()
    var from = 0
    var done = n == 0
    while (!done) {
      var p = from
      var matched = false
      while (p < n && !matched) {
        // at absolute position 0 the zero-width `^` alternative is tried
        // first (run starts AT 0); otherwise — and as the fallback at 0 —
        // group 1 consumes one boundary code point
        var rs = -1
        if (p == 0) {
          val e0 = tryRun(0)
          if (e0 >= 0) { rs = 0 }
        }
        if (rs < 0 && isBoundary(s.charAt(p))) {
          val step = if (Character.isHighSurrogate(s.charAt(p)) && p + 1 < n &&
            Character.isLowSurrogate(s.charAt(p + 1))) 2 else 1
          if (tryRun(p + step) >= 0) rs = p + step
        }
        if (rs >= 0) {
          val e = tryRun(rs)
          cands.add(s.substring(rs, e))
          // group 3 consumes one boundary CODE POINT (zero-width `$` at end)
          from =
            if (e >= n) n
            else if (Character.isHighSurrogate(s.charAt(e)) && e + 1 < n &&
              Character.isLowSurrogate(s.charAt(e + 1))) e + 2
            else e + 1
          matched = true
        } else p += 1
      }
      if (!matched || from >= n) done = true
    }
    // Luhn (mod-10) over the separator-stripped reversed digits: double
    // every second digit, fold > 9 by -9 — exact integer math
    def luhnOk(cand: String): Boolean = {
      var sum = 0
      var seen = 0
      var i = cand.length - 1
      while (i >= 0) {
        val c = cand.charAt(i)
        if (isDigit(c)) {
          seen += 1
          val d = c - '0'
          sum += (if (seen % 2 == 0) { val t = 2 * d; if (t > 9) t - 9 else t } else d)
        }
        i -= 1
      }
      seen >= 13 && seen <= 19 && sum % 10 == 0
    }
    val valid = new java.util.ArrayList[String]()
    var k = 0
    while (k < cands.size()) {
      if (luhnOk(cands.get(k))) valid.add(cands.get(k))
      k += 1
    }
    var scrubbed = s
    k = 0
    while (k < valid.size()) {
      scrubbed = scrubbed.replace(valid.get(k), "<CARD>")
      k += 1
    }
    def arr(l: java.util.ArrayList[String]): GenericArrayData = {
      val a = new Array[Any](l.size())
      var j = 0
      while (j < a.length) { a(j) = UTF8String.fromString(l.get(j)); j += 1 }
      new GenericArrayData(a)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](arr(cands), arr(valid), UTF8String.fromString(scrubbed)))
  }
}

/** Base for graft's unary string-hash expressions: codegen is a static call. */
abstract class TextHashExpression extends UnaryExpression {
  /** Scala call for interpreted eval and Java call text for codegen. */
  protected def staticCall(c: String): String

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => staticCall(c))
}

case class Tokenize(child: Expression) extends TextHashExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize_text"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.tokenizeArray(input.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash$$.MODULE$$.tokenizeArray($c)"
  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

case class StopwordScores(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression {
  require(profiles.nonEmpty, "stopword_scores needs at least one profile")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "stopword_scores"
  // word -> distinct profile indices; rebuilt once per deserialized
  // expression (per executor), never per row
  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    profiles.zipWithIndex.foreach { case (words, i) =>
      words.distinct.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }
  override protected def nullSafeEval(input: Any): Any =
    TextHash.stopwordScores(input.asInstanceOf[UTF8String], lookup, profiles.size)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopLookup", lookup, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHash$$.MODULE$$.stopwordScores($c, $ref, ${profiles.size})")
  }
  override protected def withNewChildInternal(newChild: Expression): StopwordScores =
    copy(child = newChild)
}

case class MinHashSignature(child: Expression, numHashes: Int, words: Int,
    scriptAware: Boolean = false)
    extends TextHashExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhashSignature(input.asInstanceOf[UTF8String], numHashes, words, scriptAware)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash$$.MODULE$$.minhashSignature($c, $numHashes, $words, $scriptAware)"
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

case class WordShingles(child: Expression, words: Int, scriptAware: Boolean = false)
    extends TextHashExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.wordShingles(input.asInstanceOf[UTF8String], words, scriptAware)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash$$.MODULE$$.wordShingles($c, $words, $scriptAware)"
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

case class WordNgrams(child: Expression, n: Int, scriptAware: Boolean = false)
    extends TextHashExpression {
  require(n >= 1, s"n must be at least 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.wordNgrams(input.asInstanceOf[UTF8String], n, scriptAware)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash$$.MODULE$$.wordNgrams($c, $n, $scriptAware)"
  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

case class RollingFingerprint(child: Expression, window: Int,
    scriptAware: Boolean = false) extends TextHashExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "rolling_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.rollingFingerprint(input.asInstanceOf[UTF8String], window, scriptAware)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash$$.MODULE$$.rollingFingerprint($c, $window, $scriptAware)"
  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

case class SimHash32(child: Expression, scriptAware: Boolean = false)
    extends TextHashExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhash32(input.asInstanceOf[UTF8String], scriptAware)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash$$.MODULE$$.simhash32($c, $scriptAware)"
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

case class UnicodeNormalize(child: Expression, form: String) extends TextHashExpression {
  require(UnicodeNormalize.Forms(form), s"form must be one of ${UnicodeNormalize.Forms}, got $form")
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.unicodeNormalize(input.asInstanceOf[UTF8String], form)
  override protected def staticCall(c: String): String =
    s"""graft.functions.TextHash$$.MODULE$$.unicodeNormalize($c, "$form")"""
  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}

case class SimHash64(child: Expression, scriptAware: Boolean = false)
    extends TextHashExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhash64(input.asInstanceOf[UTF8String], scriptAware)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash$$.MODULE$$.simhash64($c, $scriptAware)"
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

case class HashedTf(child: Expression, dims: Int, scriptAware: Boolean = false)
    extends TextHashExpression {
  require(dims >= 1 && dims <= 65536, s"dims ($dims) must be in [1, 65536]")
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "hashed_tf"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.hashedTf(input.asInstanceOf[UTF8String], dims, scriptAware)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash$$.MODULE$$.hashedTf($c, $dims, $scriptAware)"
  override protected def withNewChildInternal(newChild: Expression): HashedTf =
    copy(child = newChild)
}

case class ScriptTokens(child: Expression) extends TextHashExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "script_tokens"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.scriptTokens(input.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash$$.MODULE$$.scriptTokens($c)"
  override protected def withNewChildInternal(newChild: Expression): ScriptTokens =
    copy(child = newChild)
}

case class ScriptCounts(child: Expression) extends TextHashExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "script_counts"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.scriptCounts(input.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash$$.MODULE$$.scriptCounts($c)"
  override protected def withNewChildInternal(newChild: Expression): ScriptCounts =
    copy(child = newChild)
}

case class CardScan(child: Expression) extends TextHashExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("cands", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("valid", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("scrubbed", StringType, nullable = false)))
  override def prettyName: String = "card_scan"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.cardScan(input.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash$$.MODULE$$.cardScan($c)"
  override protected def withNewChildInternal(newChild: Expression): CardScan =
    copy(child = newChild)
}

case class SentenceChunks(child: Expression, maxChars: Int, overlap: Int)
    extends TextHashExpression {
  require(maxChars > 0, "maxChars must be positive")
  require(overlap >= 0 && overlap * 2 <= maxChars, "overlap must be in [0, maxChars/2]")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_id", LongType, nullable = false),
    StructField("chunk_text", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "sentence_chunks"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.sentenceChunks(input.asInstanceOf[UTF8String], maxChars, overlap)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHash$$.MODULE$$.sentenceChunks($c, $maxChars, $overlap)"
  override protected def withNewChildInternal(newChild: Expression): SentenceChunks =
    copy(child = newChild)
}

/** Column-API constructors for the native expressions. */
object functions {
  private def lit(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"expected integer literal, got $other")
  }

  def minhash_signature(text: Column, numHashes: Int = 12, words: Int = 5,
      scriptAware: Boolean = false): Column =
    GraftExpressionBridge.column(
      MinHashSignature(GraftExpressionBridge.expression(text), numHashes, words, scriptAware))

  def word_shingles(text: Column, words: Int = 5, scriptAware: Boolean = false): Column =
    GraftExpressionBridge.column(
      WordShingles(GraftExpressionBridge.expression(text), words, scriptAware))

  def stopword_scores(text: Column, profiles: Seq[Seq[String]]): Column =
    GraftExpressionBridge.column(
      StopwordScores(GraftExpressionBridge.expression(text), profiles))

  def tokenize_text(text: Column): Column =
    GraftExpressionBridge.column(Tokenize(GraftExpressionBridge.expression(text)))

  /** Adjacent word n-grams (codegen'd); empty array below `n` tokens;
    * null text null-propagates (null out, not an empty array). */
  def word_ngrams(text: Column, n: Int = 2, scriptAware: Boolean = false): Column =
    GraftExpressionBridge.column(
      WordNgrams(GraftExpressionBridge.expression(text), n, scriptAware))

  def rolling_fingerprint(text: Column, window: Int = 5,
      scriptAware: Boolean = false): Column =
    GraftExpressionBridge.column(
      RollingFingerprint(GraftExpressionBridge.expression(text), window, scriptAware))

  def simhash32(text: Column, scriptAware: Boolean = false): Column =
    GraftExpressionBridge.column(
      SimHash32(GraftExpressionBridge.expression(text), scriptAware))

  def simhash64(text: Column, scriptAware: Boolean = false): Column =
    GraftExpressionBridge.column(
      SimHash64(GraftExpressionBridge.expression(text), scriptAware))

  /** Sentence-boundary chunk windows (codegen'd, one char scan) as
    * `array<struct<chunk_id, chunk_text>>`; empty array when the text has
    * no sentences; null text null-propagates. Bit-identical to
    * `TextAnalysis.chunkBySentences`'s composed form (parity-spec'd). */
  def sentence_chunks(text: Column, maxChars: Int, overlap: Int): Column =
    GraftExpressionBridge.column(
      SentenceChunks(GraftExpressionBridge.expression(text), maxChars, overlap))

  /** PII card scan (codegen'd, one char pass): candidate digit runs, the
    * Luhn-valid subset, and the `<CARD>`-masked text as one struct —
    * bit-identical to the composed `TextAnalysis.cardCandidates` /
    * `validCardNumbers` / `scrubCardNumbers` regex chain (parity-spec'd).
    * Null text null-propagates. */
  def card_scan(text: Column): Column =
    GraftExpressionBridge.column(CardScan(GraftExpressionBridge.expression(text)))

  /** Per-script character counts (codegen'd, one pass); index order is
    * `TextAnalysis.ScriptRanges` sorted keys. Null text null-propagates. */
  def script_counts(text: Column): Column =
    GraftExpressionBridge.column(ScriptCounts(GraftExpressionBridge.expression(text)))

  /** Script-aware tokens (codegen'd, one pass): word-script runs as word
    * tokens, Han/kana/Thai runs as character bigrams. Null text
    * null-propagates. */
  def script_tokens(text: Column): Column =
    GraftExpressionBridge.column(ScriptTokens(GraftExpressionBridge.expression(text)))

  /** Hashing-trick TF vector (codegen'd, one pass); null text null-propagates. */
  def hashed_tf(text: Column, dims: Int = 256, scriptAware: Boolean = false): Column =
    GraftExpressionBridge.column(
      HashedTf(GraftExpressionBridge.expression(text), dims, scriptAware))

  /** Unicode normalization (NFC/NFD/NFKC/NFKD); default NFKC — the LLM-pipeline fold. */
  def unicode_normalize(text: Column, form: String = "NFKC"): Column =
    GraftExpressionBridge.column(
      UnicodeNormalize(GraftExpressionBridge.expression(text), form))

  /**
   * Bounded bottom-k aggregate: the `k` smallest values of `e` (by the
   * type's natural ordering — for structs, lexicographic by field), as an
   * ascending array. Wraps Spark's `CollectTopK` (the engine behind
   * pandas-on-Spark `nsmallest`): each partial buffer is a k-capped
   * priority queue, so memory is O(k) per group and partials merge
   * map-side — the scale-safe primitive for deterministic bottom-k
   * sampling ([[graft.ops.Sketches.quantileSketch]]), vs a full per-group
   * sort in the window formulation.
   */
  def collect_bottom_k(e: Column, k: Int): Column = {
    require(k > 0, "k must be positive")
    GraftExpressionBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK(
        GraftExpressionBridge.expression(e), k, reverse = true).toAggregateExpression())
  }

  /** Bounded bottom-k DISTINCT aggregate over a STRING column: the `k`
    * smallest distinct values as an ascending array — the one-pass KMV
    * SET-sketch engine (dedup lives inside the O(k) buffer, so only
    * k-entry partials ever cross an exchange; see
    * [[graft.functions.BottomKDistinct]]). */
  def bottom_k_distinct(e: Column, k: Int): Column =
    GraftExpressionBridge.column(
      BottomKDistinct(GraftExpressionBridge.expression(e), k).toAggregateExpression())

  /** Misra-Gries heavy-hitters aggregate over a STRING key: at most
    * `capacity` counters, output sorted `(cnt DESC, key)` as
    * `array<struct<key,cnt>>`; exact when `capacity >= distinct keys`,
    * else `est <= true <= est + n/(capacity+1)` (see
    * [[graft.functions.MisraGries]]). */
  def misra_gries(e: Column, capacity: Int): Column =
    GraftExpressionBridge.column(
      MisraGries(GraftExpressionBridge.expression(e), capacity).toAggregateExpression())

  /** Merge aggregate over [[misra_gries]] summaries — the daily-to-all-time
    * re-rollup path, never re-reading raw keys. */
  def misra_gries_merge(e: Column, capacity: Int): Column =
    GraftExpressionBridge.column(
      MisraGriesMerge(GraftExpressionBridge.expression(e), capacity).toAggregateExpression())

  /** Count-min sketch aggregate over a STRING key: a `depth x width` grid
    * of counters as `array<long>`; `true <= est <= true + 2n/width` w.p.
    * `1 - 2^-depth`, EXACT element-wise merge (see
    * [[graft.functions.CountMinSketch]]). */
  def count_min(e: Column, width: Int = 1024, depth: Int = 4): Column =
    GraftExpressionBridge.column(
      CountMinSketch(GraftExpressionBridge.expression(e), width, depth).toAggregateExpression())

  /** Merge aggregate over [[count_min]] grids — exact element-wise sum. */
  def count_min_merge(e: Column, width: Int = 1024, depth: Int = 4): Column =
    GraftExpressionBridge.column(
      CountMinMerge(GraftExpressionBridge.expression(e), width, depth).toAggregateExpression())

  /** Point-frequency estimate of `key` from a [[count_min]] grid. */
  def cms_estimate(sketch: Column, key: Column, width: Int = 1024, depth: Int = 4): Column =
    GraftExpressionBridge.column(CmsEstimate(
      GraftExpressionBridge.expression(sketch),
      GraftExpressionBridge.expression(key), width, depth))

  /** Gram-matrix / mean-vector sufficient-statistics aggregate over a
    * numeric-array column: the packed `[n | Σx_i | Σx_i*x_j]` micro-unit
    * summary as `array<long>` (see [[graft.functions.GramMatrix]]);
    * per-row micro-truncate then exact integer accumulate, so the result
    * is order-independent and engine-replayable. */
  def gram_matrix(vec: Column, dim: Int): Column =
    GraftExpressionBridge.column(
      GramMatrix(GraftExpressionBridge.expression(vec), dim).toAggregateExpression())

  /** Merge aggregate over [[gram_matrix]] summaries — exact element-wise
    * sum, the daily-to-all-time re-rollup path. */
  def gram_merge(vec: Column, dim: Int): Column =
    GraftExpressionBridge.column(
      GramMerge(GraftExpressionBridge.expression(vec), dim).toAggregateExpression())

  /** Unrestricted Damerau-Levenshtein distance over code points
    * (codegen'd; see [[graft.functions.StringDistanceOps]]). */
  def damerau_levenshtein(a: Column, b: Column): Column =
    GraftExpressionBridge.column(DamerauLevenshtein(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  /** Aho–Corasick multi-pattern search: distinct matched patterns in
    * binary-sorted order (codegen'd, ONE text pass however many patterns);
    * empty array on no match, null text null-propagates. */
  def multi_match(text: Column, patterns: Seq[String]): Column =
    MultiMatch.column(text, patterns)

  /** SQL registration, for `spark.sql.extensions=graft.functions.GraftExtensions`. */
  val registry: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => MinHashSignature(args.head,
        if (args.length > 1) lit(args(1)) else 12, if (args.length > 2) lit(args(2)) else 5)),
    (FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (args: Seq[Expression]) => WordNgrams(args.head,
        if (args.length > 1) lit(args(1)) else 2)),
    (FunctionIdentifier("rolling_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "rolling_fingerprint"),
      (args: Seq[Expression]) => RollingFingerprint(args.head,
        if (args.length > 1) lit(args(1)) else 5)),
    (FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (args: Seq[Expression]) => SimHash32(args.head)),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    (FunctionIdentifier("script_counts"),
      new ExpressionInfo(classOf[ScriptCounts].getName, "script_counts"),
      (args: Seq[Expression]) => ScriptCounts(args.head)),
    (FunctionIdentifier("script_tokens"),
      new ExpressionInfo(classOf[ScriptTokens].getName, "script_tokens"),
      (args: Seq[Expression]) => ScriptTokens(args.head)),
    (FunctionIdentifier("hashed_tf"),
      new ExpressionInfo(classOf[HashedTf].getName, "hashed_tf"),
      (args: Seq[Expression]) => HashedTf(args.head,
        if (args.length > 1) lit(args(1)) else 256)),
    (FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (args: Seq[Expression]) => UnicodeNormalize(args.head,
        if (args.length > 1) litStr(args(1)) else "NFKC")),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))),
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => CosineSimilarity(args.head, args(1))),
    (FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[LshBucket].getName, "lsh_bucket"),
      (args: Seq[Expression]) => LshBucket(args.head,
        if (args.length > 1) lit(args(1)) else 8)),
    (FunctionIdentifier("sign_sketch"),
      new ExpressionInfo(classOf[SignSketch].getName, "sign_sketch"),
      (args: Seq[Expression]) => SignSketch(args.head,
        if (args.length > 1) lit(args(1)) else 48)),
    (FunctionIdentifier("random_project"),
      new ExpressionInfo(classOf[RandomProject].getName, "random_project"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"random_project(vec, k) takes 2 arguments, got ${args.length}")
        RandomProject(args.head, lit(args(1)))
      }),
    (FunctionIdentifier("collect_bottom_k"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK].getName,
        "collect_bottom_k"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"collect_bottom_k(expr, k) takes 2 arguments, got ${args.length}")
        val k = lit(args(1))
        require(k >= 1, s"collect_bottom_k k must be at least 1, got $k")
        new org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK(
          args.head, k, reverse = true).toAggregateExpression()
      }),
    (FunctionIdentifier("bottom_k_distinct"),
      new ExpressionInfo(classOf[BottomKDistinct].getName, "bottom_k_distinct"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"bottom_k_distinct(expr, k) takes 2 arguments, got ${args.length}")
        BottomKDistinct(args.head, lit(args(1))).toAggregateExpression()
      }),
    (FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"misra_gries(key, capacity) takes 2 arguments, got ${args.length}")
        MisraGries(args.head, lit(args(1))).toAggregateExpression()
      }),
    (FunctionIdentifier("misra_gries_merge"),
      new ExpressionInfo(classOf[MisraGriesMerge].getName, "misra_gries_merge"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"misra_gries_merge(summary, capacity) takes 2 arguments, got ${args.length}")
        MisraGriesMerge(args.head, lit(args(1))).toAggregateExpression()
      }))

  private def litStr(e: Expression): String = e match {
    case Literal(v: UTF8String, StringType) => v.toString
    case other => throw new IllegalArgumentException(s"expected string literal, got $other")
  }
}

/** Registers graft's native functions for SQL use via SparkSessionExtensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.registry.foreach(ext.injectFunction(_))
}
