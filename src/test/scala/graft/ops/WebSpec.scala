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

  test("registeredDomain takes two labels, three under ccTLD second-level suffixes") {
    def dom(h: String): String = run(h, Web.registeredDomain(_))
    dom("www.blog.example.co.uk") shouldBe "example.co.uk"
    dom("cdn.example.com") shouldBe "example.com"
    dom("example.com") shouldBe "example.com"
    dom("localhost") shouldBe "localhost"
    dom("a.b.c.d.gov.br") shouldBe "d.gov.br"
    dom("deep.sub.plain.io") shouldBe "plain.io"
    // dominant ccTLD second-level registrations group at three labels
    dom("shop.example.com.br") shouldBe "example.com.br"
    dom("www.example.or.jp") shouldBe "example.or.jp"
    dom("mail.example.ne.jp") shouldBe "example.ne.jp"
    dom("www.john.id.au") shouldBe "john.id.au"
    dom("news.example.co.kr") shouldBe "example.co.kr"
    dom("portal.example.gouv.fr") shouldBe "example.gouv.fr"
    dom("x.example.ac.in") shouldBe "example.ac.in"
    // the rule only fires under two-letter (ccTLD-shaped) top labels: gTLD
    // hosts ending in a listed label keep their own registration
    dom("mail.me.com") shouldBe "me.com"
    dom("www.pe.com") shouldBe "pe.com"
    dom("sub.example.co.com") shouldBe "co.com"
  }

  test("registeredDomain keeps the user label under hosting-platform private suffixes") {
    def dom(h: String): String = run(h, Web.registeredDomain(_))
    // each user site is its own registrant, not one platform-wide domain
    dom("alice.blogspot.com") shouldBe "alice.blogspot.com"
    dom("bob.blogspot.com") shouldBe "bob.blogspot.com"
    dom("www.alice.blogspot.com") shouldBe "alice.blogspot.com"
    dom("alice.github.io") shouldBe "alice.github.io"
    dom("docs.project.readthedocs.io") shouldBe "project.readthedocs.io"
    dom("my-app.herokuapp.com") shouldBe "my-app.herokuapp.com"
    dom("site.netlify.app") shouldBe "site.netlify.app"
    // composes with the ccTLD rule: the base lands on blogspot.co.uk, so
    // the user label is kept on top of the three-label suffix
    dom("alice.blogspot.co.uk") shouldBe "alice.blogspot.co.uk"
    dom("www.alice.blogspot.co.uk") shouldBe "alice.blogspot.co.uk"
    dom("alice.blogspot.de") shouldBe "alice.blogspot.de"
    // the platform apex itself (no user label) passes through unwidened
    dom("blogspot.com") shouldBe "blogspot.com"
    dom("github.io") shouldBe "github.io"
    // non-listed lookalikes keep the plain two-label rule
    dom("alice.blogspot.org") shouldBe "blogspot.org"
    dom("x.github.com") shouldBe "github.com"
  }

  test("dedupByUrl keeps the smallest-keyed row per canonical URL, null URLs pass") {
    val rows = Seq(
      (1L, "HTTP://X.com:80/a?utm_source=s"),
      (2L, "http://x.com/a"),         // same canonical as 1 -> 1 wins
      (3L, "x.com/a#frag"),           // schemeless + fragment, same page
      (4L, "http://x.com/a?ref=keep"),// real param -> its own group
      (5L, null),                     // no URL -> kept untouched
      (6L, null),
      (7L, "https://y.org/b"),
      (8L, "https://y.org/b/")).toDF("id", "url") // trailing slash differs: kept
    val kept = Web.dedupByUrl(rows, "url", "id")
      .select($"id").as[Long].collect().sorted
    kept shouldBe Array(1L, 4L, 5L, 6L, 7L, 8L)
  }

  test("dedupByUrlKeepBest keeps the best-scored recrawl, null scores lose") {
    val rows = Seq(
      (1L, "http://x.com/a", Some(10L)),  // same page, lower score
      (2L, "HTTP://X.com:80/a", Some(99L)), // best score wins
      (3L, "x.com/a#f", None),            // null score loses to any scored row
      (4L, "http://y.com/b", None),       // all-null group: smallest id wins
      (5L, "http://y.com/b?utm_x=1", None),
      (6L, null, Some(1L))).toDF("id", "url", "score")
    val kept = Web.dedupByUrlKeepBest(rows, "url", "score", "id")
      .select($"id").as[Long].collect().sorted
    kept shouldBe Array(2L, 4L, 6L)
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

  test("normalizeUrl and registeredDomain are idempotent over the URL shape grid") {
    // canonical forms feed the URL dedup stores: a non-idempotent
    // canonicalizer would stop recrawls of already-canonical URLs from
    // matching the store. 1920 structured combinations.
    val urls = for {
      s <- Seq("http://", "HTTPS://", "", "ftp://")
      h <- Seq("X.com", "www.Example.CO.UK", "a.b.c.net")
      po <- Seq("", ":80", ":443", ":8080")
      pa <- Seq("", "/", "/Path/Is", "/p")
      q <- Seq("", "?a=1", "?utm_source=s", "?a=1&utm_x=2&b=3", "?utm_a=1&gclid=g")
      f <- Seq("", "#f")
    } yield s + h + po + pa + q + f
    val df = urls.toDF("u")
      .select($"u", Web.normalizeUrl($"u").as("c1"), Web.urlHost($"u").as("h1"))
      .select($"u", $"c1", Web.normalizeUrl($"c1").as("c2"),
        Web.registeredDomain($"h1").as("d1"))
      .select($"u", $"c1", $"c2", $"d1", Web.registeredDomain($"d1").as("d2"))
    df.filter($"c1" =!= $"c2").select("u", "c1", "c2").collect() shouldBe empty
    df.filter($"d1" =!= $"d2").select("u", "d1", "d2").collect() shouldBe empty
  }

  test("urlQualityFlags gate non-page, deep, long, parameter-heavy and blocked URLs") {
    def flags(u: String): Map[String, Long] = {
      val cols = Web.urlQualityFlags(org.apache.spark.sql.functions.col("u"))
        .map { case (n, c) => c.as(n) }
      Seq(u).toDF("u").select(cols: _*).collect().head.getValuesMap[Long](
        Seq("ok_extension", "ok_depth", "ok_length", "ok_params", "ok_words", "passes"))
    }
    flags("https://example.com/articles/how-to-cook")("passes") shouldBe 1L
    flags("https://example.com/a.b/page")("passes") shouldBe 1L // dot in a dir, no ext
    flags("https://example.com/img/photo.JPG")("ok_extension") shouldBe 0L // case-folded
    flags("https://example.com/data.tar.gz")("ok_extension") shouldBe 0L
    flags("https://example.com/page.html")("ok_extension") shouldBe 1L // html IS a page
    flags("https://example.com/" + (1 to 11).map("s" + _).mkString("/"))(
      "ok_depth") shouldBe 0L
    flags("https://example.com/" + (1 to 10).map("s" + _).mkString("/"))(
      "ok_depth") shouldBe 1L // boundary: exactly maxDepth passes
    flags("https://example.com/p?" + (1 to 9).map(i => s"p$i=$i").mkString("&"))(
      "ok_params") shouldBe 0L
    flags("https://example.com/p?" + (1 to 8).map(i => s"p$i=$i").mkString("&"))(
      "ok_params") shouldBe 1L
    flags("https://example.com/q?s=" + "x" * 600)("ok_length") shouldBe 0L
    flags("https://example.com/CASINO/bonus")("ok_words") shouldBe 0L
    flags("https://example.com/bare")("ok_params") shouldBe 1L // no query at all
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

  test("domainDedupProfile: exact dup pressure per domain, zero for all-unique") {
    import spark.implicits._
    val docs = Seq(
      ("a.com", "same page"), ("a.com", "same page"), ("a.com", "same page"),
      ("a.com", "other page"),
      ("b.org", "x"), ("b.org", "y")).toDF("domain", "text")
    val out = Web.domainDedupProfile(docs, "domain", "text")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    out("a.com") shouldBe ((4L, 2L, 500000L)) // 2 of 4 docs are copies
    out("b.org") shouldBe ((2L, 2L, 0L))
  }

  test("anchorTextProfile ranks terms per host by count, ties by term, capped at k") {
    import spark.implicits._
    val links = Seq(
      ("a.com", "best spark guide"), ("a.com", "spark tutorial"),
      ("a.com", "spark guide here"), ("a.com", "also tutorial"),
      ("b.org", "cheap pills")).toDF("host", "anchor")
    val out = Web.anchorTextProfile(links, "host", "anchor", k = 2)
      .as[(String, String, Long, Long)].collect().toSet
    // a.com: spark x3, guide x2 = tutorial x2 -> tie breaks alphabetically
    out shouldBe Set(
      ("a.com", "spark", 3L, 1L), ("a.com", "guide", 2L, 2L),
      ("b.org", "cheap", 1L, 1L), ("b.org", "pills", 1L, 2L))
  }

  test("pathRollup: prefixes up to maxDepth, host normalization, bare hosts") {
    import spark.implicits._
    val urls = Seq(
      "https://Ex.COM:443/a/b/c?q=1#frag",
      "http://ex.com/a//b/",          // empty segment collapses
      "ex.com/a/x",                   // schemeless
      "https://ex.com",               // bare host: no rows
      "https://other.net/z/w/v/u/t"   // depth-capped at 3
    ).toDF("url")
    val out = Web.pathRollup(urls, "url", maxDepth = 3)
      .as[(String, Long, String, Long)].collect().toSet
    out shouldBe Set(
      ("ex.com", 1L, "/a", 3L),
      ("ex.com", 2L, "/a/b", 2L),
      ("ex.com", 3L, "/a/b/c", 1L),
      ("ex.com", 2L, "/a/x", 1L),
      ("other.net", 1L, "/z", 1L),
      ("other.net", 2L, "/z/w", 1L),
      ("other.net", 3L, "/z/w/v", 1L))
  }

  test("pathRollup counts are a pure function of the data, not partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val urls = (1 to 300).map(_ => "https://h" + rnd.nextInt(5) + ".com/" +
      (1 to (1 + rnd.nextInt(5))).map(_ => "s" + rnd.nextInt(4)).mkString("/"))
    def run(parts: Int) =
      Web.pathRollup(urls.toDF("url").repartition(parts), "url", 4)
        .collect().map(_.toSeq).toSet
    run(1) shouldBe run(11)
  }
}
