package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.unsafe.types.UTF8String

/** Property tests over the native text kernels (pure JVM, no session). */
object TextHashProps extends Properties("TextHash") {

  // unicode strings biased toward the interesting planes: ascii, latin with
  // combining marks, fullwidth forms, ligatures
  private val genChar: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    1 -> Gen.oneOf("é", "é", "ü", "ü", "ñ", "ñ"),
    1 -> Gen.oneOf("Ａ", "ｂ", "１", "ﬁ", "ﬂ", "²", "½"),
    1 -> Gen.oneOf(" ", ".", ",", "-"))
  private val genText: Gen[String] =
    Gen.listOf(genChar).map(_.mkString)
  private val genForm: Gen[String] = Gen.oneOf("NFC", "NFD", "NFKC", "NFKD")

  private def norm(s: String, form: String): String =
    TextHash.unicodeNormalize(UTF8String.fromString(s), form).toString

  property("unicodeNormalize is idempotent") = forAll(genText, genForm) { (s, form) =>
    val once = norm(s, form)
    norm(once, form) == once
  }

  property("canonically-equivalent inputs converge under every form") =
    forAll(genText, genForm) { (s, form) =>
      // NFD(s) is canonically equivalent to s: any form must agree on both
      val decomposed = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      norm(s, form) == norm(decomposed, form)
    }

  property("NFKC output is NFC-stable (compat fold subsumes canonical)") =
    forAll(genText) { s =>
      val folded = norm(s, "NFKC")
      norm(folded, "NFC") == folded
    }

  property("tokenize ignores normalization-invisible differences on ascii") =
    forAll(Gen.listOf(Gen.alphaNumChar).map(_.mkString)) { s =>
      TextHash.tokenize(s).sameElements(TextHash.tokenize(norm(s, "NFKC")))
    }

  // chars biased toward the script ranges AND their boundaries: one char
  // inside each range, the code points just outside each edge, astral
  // chars (surrogate pairs, in no range), and plain separators
  private val genScriptChar: Gen[String] = Gen.frequency(
    4 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf("Ж", "ش", "ह", "Ω", "한", "漢", "ש", "か", "ไ", "ÿ"),
    1 -> Gen.oneOf("ͯ", "Ԁ", "֏", "ঀ", "㐀",
      "䷿", "ꀀ", "꯿", "힤", "຀", "〰"),
    1 -> Gen.oneOf("𝔸", "🙂", "𠀀"),
    1 -> Gen.oneOf(" ", ".", "-", "０", "ｱ"))
  private val genScriptText: Gen[String] =
    Gen.listOf(genScriptChar).map(_.mkString)

  property("scriptCounts equals the per-range regex count (code points)") =
    forAll(genScriptText) { s =>
      val counts = TextHash.scriptCounts(UTF8String.fromString(s))
      graft.ops.TextAnalysis.ScriptRanges.zipWithIndex.forall { case ((_, r), i) =>
        // the composed Spark form is length(s) - length(regexp_replace):
        // Spark length() counts code points, so the reference does too
        val stripped = s.replaceAll(s"[$r]", "")
        val expected = s.codePointCount(0, s.length) -
          stripped.codePointCount(0, stripped.length)
        counts.getLong(i) == expected.toLong
      }
    }

  // pure-JVM reference for scriptTokenize: classify per code unit with
  // regexes over one-char strings, group runs, expand seg runs to bigrams
  private def scriptTokenizeRef(s: String): Seq[String] = {
    val word = ("[a-zA-Z0-9\\x{0370}-\\x{04ff}\\x{0590}-\\x{05ff}" +
      "\\x{0600}-\\x{06ff}\\x{0900}-\\x{097f}\\x{ac00}-\\x{d7a3}]").r
    val seg = "[\\x{0e00}-\\x{0e7f}\\x{3040}-\\x{30ff}\\x{4e00}-\\x{9fff}]".r
    def cls(c: Char): Int = {
      val cs = c.toString
      if (word.matches(cs)) 1 else if (seg.matches(cs)) 2 else 0
    }
    val runs = s.foldLeft(List.empty[(Int, StringBuilder)]) { (acc, c) =>
      acc match {
        case (k, sb) :: _ if k == cls(c) => sb.append(c); acc
        case _ => (cls(c), new StringBuilder(c.toString)) :: acc
      }
    }.reverse
    runs.flatMap {
      // ASCII-only case fold, matching the kernel (non-ASCII case law is
      // engine-specific, so the kernel leaves it untouched)
      case (1, sb) =>
        Seq(sb.toString.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c))
      case (2, sb) =>
        val r = sb.toString
        if (r.length == 1) Seq(r) else r.sliding(2).toSeq
      case _ => Seq.empty
    }
  }

  property("scriptTokenize equals the run-classify/bigram-expand reference") =
    forAll(genScriptText) { s =>
      TextHash.scriptTokenize(s).toSeq == scriptTokenizeRef(s)
    }

  property("scriptTokenize equals tokenize on pure-ASCII text") =
    forAll(Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar.map(_.toString),
      1 -> Gen.oneOf(" ", ".", ",", "-", "_"))).map(_.mkString)) { s =>
      TextHash.scriptTokenize(s).sameElements(TextHash.tokenize(s))
    }

  property("wordNgrams equals sliding windows over tokenize") =
    forAll(genText, Gen.choose(1, 4)) { (s, n) =>
      val kernel = TextHash.wordNgrams(UTF8String.fromString(s), n, scriptAware = false)
      val toks = TextHash.tokenize(s)
      val expected =
        if (toks.length < n) Seq.empty[String]
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      kernel.numElements == expected.size &&
        expected.indices.forall(i => kernel.getUTF8String(i).toString == expected(i))
    }
}
