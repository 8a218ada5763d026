package graft.etl

import scala.util.{Failure, Success}

import graft._
import graft.testkit.SparkTestBase
import graft.time.Day

/** Ports the behavior of reference core StageSpec.scala. */
class StageSpec extends SparkTestBase {
  import spark.implicits._

  private def ctx = Stage.Context(spark, Day(2026, 8, 12))

  test("source resets the context value to the session") {
    val st = Stage.source[Long]("nums")(c => c.spark.range(3).as[Long])
    st.run(ctx).get.collect().sorted shouldBe Array(0L, 1L, 2L)
  }

  test("transform sees the upstream dataset; sink returns its input") {
    var sunk: Seq[Long] = Nil
    val pipeline = for {
      _ <- "nums".source(c => c.spark.range(5).as[Long])
      doubled <- Stage.transform[Long, Long]("double")(c => c.value.map(_ * 2))
      out <- "collect".sink[Long](c => sunk = c.value.collect().toSeq.sorted)
    } yield out
    val result = pipeline.run(ctx).get.collect().toSeq.sorted
    sunk shouldBe Seq(0L, 2L, 4L, 6L, 8L)
    result shouldBe sunk // sink passes its input through
  }

  test("map transforms without adding a stage") {
    Stage[Any, Int]("n")(_ => 21).map(_ * 2).run(ctx).get shouldBe 42
  }

  test("flatMap threads values and failures short-circuit") {
    val boom = new RuntimeException("boom")
    val failing = Stage[Any, Int]("fail")(_ => throw boom)
    var downstreamRan = false
    val pipeline = failing.flatMap { _ =>
      Stage[Int, Int]("after") { c => downstreamRan = true; c.value + 1 }
    }
    pipeline.run(ctx) shouldBe Failure(boom)
    downstreamRan shouldBe false
  }

  test("andThen / ~> ignore the upstream value but keep the context") {
    val a = Stage[Any, Int]("a")(_ => 1)
    val b = Stage[Int, Int]("b")(c => c.value + 10)
    (a ~> b).run(ctx).get shouldBe 11
    a.andThen(b).run(ctx).get shouldBe 11
  }

  test("sequence is fail-fast") {
    var ran = Vector.empty[String]
    def st(name: String, ok: Boolean) = Stage[Any, String](name) { _ =>
      ran :+= name
      if (!ok) sys.error(s"$name failed") else name
    }
    val result = Stage.sequence(Seq(st("a", ok = true), st("b", ok = false), st("c", ok = true))).run(ctx)
    result.isFailure shouldBe true
    ran shouldBe Vector("a", "b") // c never ran
  }

  test("sequenceAll runs everything and aggregates failures") {
    var ran = Vector.empty[String]
    def st(name: String, ok: Boolean) = Stage[Any, String](name) { _ =>
      ran :+= name
      if (!ok) sys.error(s"$name failed") else name
    }
    val result = Stage.sequenceAll(Seq(st("a", ok = true), st("b", ok = false), st("c", ok = false))).run(ctx)
    ran shouldBe Vector("a", "b", "c")
    inside(result)
  }

  private def inside(result: scala.util.Try[Seq[String]]): Unit = result match {
    case Failure(e: Stage.SequenceAllException[_, _]) =>
      e.failures.map(_._1.name) shouldBe Seq("b", "c")
      e.getMessage should include("2 of the stages failed")
      e.getMessage should include("stage 'b'")
    case other => fail(s"expected SequenceAllException, got $other")
  }

  test("sequence of all successes returns every result in order") {
    val stages = (1 to 3).map(i => Stage[Any, Int](s"s$i")(_ => i))
    Stage.sequence(stages).run(ctx).get shouldBe Seq(1, 2, 3)
    Stage.sequenceAll(stages).run(ctx).get shouldBe Seq(1, 2, 3)
  }

  test("ensuring runs cleanup on success AND failure") {
    var cleaned = 0
    Stage[Any, Int]("ok")(_ => 1).ensuring(() => cleaned += 1)
      .run(ctx) shouldBe Success(1)
    cleaned shouldBe 1
    Stage[Any, Int]("boom")(_ => sys.error("work failed"))
      .ensuring(() => cleaned += 1).run(ctx).isFailure shouldBe true
    cleaned shouldBe 2
    // the original failure wins over a cleanup failure
    val both = Stage[Any, Int]("both")(_ => sys.error("orig"))
      .ensuring(() => sys.error("cleanup"))
    both.run(ctx) match {
      case Failure(e) => e.getMessage shouldBe "orig"
      case other      => fail(s"expected the stage failure, got $other")
    }
    // on the success path a cleanup failure surfaces
    Stage[Any, Int]("okbad")(_ => 1).ensuring(() => sys.error("cleanup"))
      .run(ctx).isFailure shouldBe true
  }

  test("identity passes the value through and composes") {
    Stage.identity[Int].run(ctx.withValue(7)) shouldBe Success(7)
    val pipeline = Stage.identity[Int].flatMap(v => Stage[Int, Int]("inc")(_ => v + 1))
    pipeline.run(ctx.withValue(41)).get shouldBe 42
  }

  test("contexts intercept each named stage exactly once (map adds no stage)") {
    // mirrors reference StageSpec's TestContext: runners hang retry and
    // monitoring off Context.run, so the interception count is the contract
    class CountingContext[+I](value: I, val names: collection.mutable.ArrayBuffer[String])
        extends Stage.Context[I](spark, Day(2026, 8, 12), value) {
      override def withValue[U](u: U): Stage.Context[U] = new CountingContext(u, names)
      override def run[O](stage: Stage[I, O], result: => O): Stage.Result[O] = {
        names += stage.name
        scala.util.Try(result)
      }
    }
    val names = collection.mutable.ArrayBuffer.empty[String]
    val ctx = new CountingContext[Int](1, names)
    Stage[Int, Int]("init")(_.value).map(_ + 1).map(_ * 2).run(ctx).get shouldBe 4
    names.toList shouldBe List("init") // map never re-enters the context
    names.clear()
    val chained = for {
      a <- Stage[Int, Int]("a")(_.value + 1)
      b <- Stage[Int, Int]("b")(_.value * 10)
    } yield b
    chained.run(new CountingContext[Int](1, names)).get shouldBe 20
    names.toList shouldBe List("a", "b") // each named stage intercepted once
    names.clear()
    val failing = Stage[Int, Int]("boom")(_ => sys.error("x")).flatMap(_ => Stage[Int, Int]("after")(_.value))
    failing.run(new CountingContext[Int](1, names)).isFailure shouldBe true
    names.toList shouldBe List("boom") // downstream never intercepted
  }

  test("string DSL builds named stages") {
    val st = "my_stage".stage[Any, Int](_ => 5)
    st.name shouldBe "my_stage"
    st.run(ctx).get shouldBe 5
    Symbol("sym_stage").stage[Any, Int](_ => 6).run(ctx).get shouldBe 6
  }
}
