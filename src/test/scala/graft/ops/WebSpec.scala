package graft.ops

import graft.testkit.SparkTestBase

class WebSpec extends SparkTestBase {
  import spark.implicits._

  private def run(url: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(url).toDF("u").select(c($"u").cast("string")).as[String].head()

  test("urlHost lowercases, strips any port, defaults schemeless to http") {
    run("HTTPS://WWW.Example.CO.UK:443/x", Web.urlHost(_)) shouldBe "www.example.co.uk"
    run("http://blog.site.com:8080/a?b#c", Web.urlHost(_)) shouldBe "blog.site.com"
    run("bare.host.org/path", Web.urlHost(_)) shouldBe "bare.host.org"
    run("ftp://Files.Example.NET", Web.urlHost(_)) shouldBe "files.example.net"
  }

  test("registeredDomain takes two labels, three under second-level suffixes") {
    def dom(h: String): String = run(h, Web.registeredDomain(_))
    dom("www.blog.example.co.uk") shouldBe "example.co.uk"
    dom("cdn.example.com") shouldBe "example.com"
    dom("example.com") shouldBe "example.com"
    dom("localhost") shouldBe "localhost"
    dom("a.b.c.d.gov.br") shouldBe "d.gov.br"
    dom("deep.sub.plain.io") shouldBe "plain.io"
  }

  test("normalizeUrl canonicalizes case, ports, fragments and tracking params") {
    def norm(u: String): String = run(u, Web.normalizeUrl(_))
    norm("HTTP://X.com:80/?utm_source=a") shouldBe "http://x.com"
    norm("http://x.com") shouldBe "http://x.com"
    norm("https://A.B.com:443/Path/Is/Kept?q=1&utm_medium=m&r=2#frag") shouldBe
      "https://a.b.com/Path/Is/Kept?q=1&r=2"
    // tracker-only query drops the '?' entirely; param order is preserved
    norm("https://x.com/p?utm_a=1&gclid=g&fbclid=f") shouldBe "https://x.com/p"
    norm("x.com/p?b=2&a=1") shouldBe "http://x.com/p?b=2&a=1"
    // non-default port is kept (only :80/:443 are default)
    norm("http://x.com:8080/p") shouldBe "http://x.com:8080/p"
  }

  test("domainQualityProfile computes exact integer ppm shares and flags") {
    val docs = Seq(
      ("good.com", "the quick brown fox jumps over the lazy dog near the river bank"),
      ("good.com", "another perfectly ordinary sentence with plain readable words here"),
      ("spam.net", "!!! $$$ ### @@@ %%% ^^^ &&& *** ((( )))"),
      ("spam.net", "buy buy buy buy buy buy buy buy buy buy")).toDF("domain", "text")
    val out = Web.domainQualityProfile(docs, "domain", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    out("good.com").getAs[Long]("n_docs") shouldBe 2L
    out("good.com").getAs[Long]("punct_ppm") shouldBe 0L
    out("good.com").getAs[Long]("gate_fail_ppm") shouldBe 0L
    out("good.com").getAs[Long]("low_quality") shouldBe 0L
    // symbol doc fails the symbol-ratio gate, repeat doc the distinct gate
    out("spam.net").getAs[Long]("gate_fail_ppm") shouldBe 1000000L
    out("spam.net").getAs[Long]("low_quality") shouldBe 1L
  }
}
