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

  property("wordNgrams equals sliding windows over tokenize") =
    forAll(genText, Gen.choose(1, 4)) { (s, n) =>
      val kernel = TextHash.wordNgrams(UTF8String.fromString(s), n)
      val toks = TextHash.tokenize(s)
      val expected =
        if (toks.length < n) Seq.empty[String]
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      kernel.numElements == expected.size &&
        expected.indices.forall(i => kernel.getUTF8String(i).toString == expected(i))
    }
}
