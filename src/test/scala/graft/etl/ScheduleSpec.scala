package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.time.{Day, Month}

/** Ports the schedule behavior of reference core Schedule.scala:58-91. */
class ScheduleSpec extends AnyFunSuite with Matchers {

  test("iterate walks backwards from the given interval") {
    Schedule.iterate(Day(2016, 7, 2)).take(3).toList shouldBe
      List(Day(2016, 7, 2), Day(2016, 7, 1), Day(2016, 6, 30))
  }

  test("iteration deduplicates and enforces monotonic decrease") {
    val messy = Schedule(LazyList(Day(2016, 7, 2), Day(2016, 7, 2), Day(2016, 7, 3), Day(2016, 7, 1)))
    messy.toList shouldBe List(Day(2016, 7, 2), Day(2016, 7, 1))
  }

  test("and appends another schedule's dates") {
    val s = Schedule(Day(2016, 7, 2)) and Schedule.iterate(Day(2016, 7, 2))
    s.take(3).toList shouldBe List(Day(2016, 7, 2), Day(2016, 7, 1), Day(2016, 6, 30))
  }

  test("where keeps the leading dates matching the predicate (backfill floor)") {
    val s = Schedule.iterate(Day(2016, 7, 2)).where(_ >= Day(2016, 6, 30))
    s.toList shouldBe List(Day(2016, 7, 2), Day(2016, 7, 1), Day(2016, 6, 30))
  }

  test("mixed granularities interleave in decreasing order") {
    val s = Schedule(LazyList(Day(2016, 7, 2), Month(2016, 6), Day(2016, 5, 30)))
    s.toList shouldBe List(Day(2016, 7, 2), Month(2016, 6), Day(2016, 5, 30))
  }

  test("the DSL exposes the standard schedules") {
    val dsl = new ScheduleDsl {}
    dsl.today.toList should have size 1
    dsl.daily.take(5).toList should have size 5
    dsl.monthly.head shouldBe Month.today
  }

  test("empty schedule iterates nothing") {
    Schedule.empty.toList shouldBe Nil
  }
}
