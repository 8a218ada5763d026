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
}
