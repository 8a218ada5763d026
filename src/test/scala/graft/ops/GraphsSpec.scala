package graft.ops

import org.apache.spark.sql.functions._

import graft.testkit.SparkTestBase

class GraphsSpec extends SparkTestBase {
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Star graph: every leaf links to the hub, hub links back to leaf1. */
  private def star = Seq(
    ("leaf1", "hub"), ("leaf2", "hub"), ("leaf3", "hub"), ("hub", "leaf1"))
    .toDF("src", "dst")

  test("the node everyone links to outranks the nodes nobody links to") {
    val ranks = Graphs.pageRank(star).as[(String, Long)].collect().toMap
    ranks("hub") should be > ranks("leaf1")
    ranks("leaf1") should be > ranks("leaf2") // hub's backlink beats no links
    ranks("leaf2") shouldBe ranks("leaf3")    // symmetric nodes tie exactly
  }

  test("total mass never exceeds the initial allocation (floor + dangling only lose)") {
    val ranks = Graphs.pageRank(star).as[(String, Long)].collect()
    ranks.map(_._2).sum should be <= Scale
    ranks.map(_._2).min should be > 0L // teleport keeps every node positive
  }

  test("ranks are a pure function of the graph, not its partitioning") {
    val a = Graphs.pageRank(star).as[(String, Long)].collect().toSet
    val b = Graphs.pageRank(star.repartition(7)).as[(String, Long)].collect().toSet
    a shouldBe b
  }

  test("duplicate edges, self-loops and null endpoints are dropped") {
    val messy = Seq(
      Some("a") -> Some("b"), Some("a") -> Some("b"), // duplicate
      Some("b") -> Some("b"),                         // self-loop
      None -> Some("b"), Some("a") -> None,           // null endpoints
      Some("b") -> Some("a"))
      .toDF("src", "dst")
    val clean = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    Graphs.pageRank(messy).as[(String, Long)].collect().toSet shouldBe
      Graphs.pageRank(clean).as[(String, Long)].collect().toSet
  }

  test("a dangling node keeps its teleport rank and leaks the rest") {
    // c has no out-edges: its inbound mass is dropped each round
    val ranks = Graphs.pageRank(Seq(("a", "b"), ("b", "c"), ("b", "a")).toDF("src", "dst"))
      .as[(String, Long)].collect().toMap
    ranks.keySet shouldBe Set("a", "b", "c")
    // c still accrues inbound from b; the graph total shrinks every round
    ranks.values.sum should be < Scale
  }

  test("one iteration matches the hand-computed integer recipe") {
    // a -> b, b -> a: n=2, base = scale/2, deg 1 each
    // round 1: share = base; rank = teleport + 85*base/100 for both
    val base = Scale / 2
    val teleport = 15L * base / 100L
    val expected = teleport + 85L * base / 100L
    val ranks = Graphs.pageRank(Seq(("a", "b"), ("b", "a")).toDF("src", "dst"),
      iterations = 1).as[(String, Long)].collect().toMap
    ranks("a") shouldBe expected
    ranks("b") shouldBe expected
  }

  test("damping 100 is pure flow, damping 0 is pure teleport") {
    val flow = Graphs.pageRank(star, dampingPct = 0).as[(String, Long)].collect().toMap
    flow.values.toSet.size shouldBe 1 // everyone sits at scale/n (teleport only)
    val hot = Graphs.pageRank(star, dampingPct = 100).as[(String, Long)].collect().toMap
    hot("hub") should be > flow("hub") // all mass flows into the hub
  }

  test("parameter validation fails fast") {
    an[IllegalArgumentException] should be thrownBy
      Graphs.pageRank(star, iterations = 0)
    an[IllegalArgumentException] should be thrownBy
      Graphs.pageRank(star, dampingPct = 101)
    an[IllegalArgumentException] should be thrownBy
      Graphs.pageRank(Seq.empty[(String, String)].toDF("src", "dst"))
  }

  test("extractLinks pulls aligned href/anchor pairs and skips the documented shapes") {
    val html =
      """<html><body><A HREF="https://x.example/a" class="n">first</A>
        |<a href='https://single.example/'>single-quoted skipped</a>
        |<a id="z" href="https://y.example/b">nested <b>markup</b> skipped</a>
        |<a href="https://z.example/c">last</a></body></html>""".stripMargin
    val out = Web.extractLinks(Seq((1L, html)).toDF("id", "html"), "id", "html")
      .orderBy("link_pos").as[(Long, Long, String, String)].collect()
    out shouldBe Array(
      (1L, 0L, "https://x.example/a", "first"),
      (1L, 1L, "https://z.example/c", "last"))
  }

  test("extractLinks: null html and link-free pages produce no rows") {
    val df = Seq((1L, Option.empty[String]), (2L, Option("<p>no links</p>")))
      .toDF("id", "html")
    Web.extractLinks(df, "id", "html").count() shouldBe 0L
  }
}
