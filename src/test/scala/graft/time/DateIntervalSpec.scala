package graft.time

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Ports the behavior of reference core DateIntervalSpec.scala. */
class DateIntervalSpec extends AnyFunSuite with Matchers {

  test("Day formats and parses its canonical form") {
    Day(2016, 8, 11).toString shouldBe "2016-08-11"
    Day.parse("2016-08-11") shouldBe Some(Day(2016, 8, 11))
    Day.parse("not-a-date") shouldBe None
  }

  test("Week uses ISO-8601 week-year semantics") {
    Week(Day(2008, 12, 29)).toString shouldBe "2009-W01" // Monday before new year
    Week(Day(2010, 1, 3)).toString shouldBe "2009-W53" // Sunday after new year
    Week(2016, 32).toString shouldBe "2016-W32"
    Week.parse("2009-W01") shouldBe Some(Week(Day(2008, 12, 29)))
    // strict resolution: 2016 has 52 ISO weeks, so W53 must NOT roll into
    // 2017-W01 (the leniency Week.apply already rejects); 2020 has 53
    Week.parse("2016-W53") shouldBe None
    Week.parse("2020-W53") shouldBe Some(Week(2020, 53))
    Week(2016, 11).by(Day) should have size 7
    an[IllegalArgumentException] should be thrownBy Week(2016, 54)
    // 53-week ISO years accept W53; 52-week years must throw, not roll over
    Week(2009, 53).toString shouldBe "2009-W53"
    Week(2020, 53).toString shouldBe "2020-W53"
    an[IllegalArgumentException] should be thrownBy Week(2016, 53)
    an[IllegalArgumentException] should be thrownBy Week(2008, 53)
  }

  test("Week truncates to Monday") {
    Week(Day(2016, 8, 11)).start.getDayOfWeek shouldBe java.time.DayOfWeek.MONDAY
  }

  test("Month truncates, formats, parses") {
    Month(Day(2016, 8, 28)) shouldBe Month(2016, 8)
    Month(2016, 8).toString shouldBe "2016-08"
    Month.parse("2016-08") shouldBe Some(Month(2016, 8))
    Month(2016, 2).by(Day) should have size 29 // leap year
  }

  test("Quarter formats, parses, iterates") {
    Quarter(2016, Quarter.Q3).toString shouldBe "2016-Q3"
    Quarter.parse("2016-Q3") shouldBe Some(Quarter(2016, Quarter.Q3))
    Quarter.parse("2016-Q5") shouldBe None
    Year(2017).by(Quarter).map(_.toString).toList shouldBe
      List("2017-Q1", "2017-Q2", "2017-Q3", "2017-Q4")
  }

  test("Year formats and iterates months") {
    Year(2016).toString shouldBe "2016"
    Year.parse("2016") shouldBe Some(Year(2016))
    Year(2016).by(Month) should have size 12
  }

  test("arithmetic: +/-, prev/next cross boundaries") {
    Day(2016, 8, 31) + 1 shouldBe Day(2016, 9, 1)
    Month(2016, 1).prev shouldBe Month(2015, 12)
    Quarter(2016, Quarter.Q4).next shouldBe Quarter(2017, Quarter.Q1)
    Year(2016) - 2 shouldBe Year(2014)
  }

  test("contains is half-open") {
    val aug = Month(2016, 8)
    aug.contains(Day(2016, 8, 1)) shouldBe true
    aug.contains(Day(2016, 8, 31)) shouldBe true
    aug.contains(Day(2016, 9, 1)) shouldBe false
    aug.contains(Day(2016, 7, 31)) shouldBe false
  }

  test("custom ranges via to/by") {
    (Day(2016, 8, 11) to Day(2016, 8, 29)).by(Day) should have size 18
    val range = Month(2016, 1) to Month(2016, 4)
    range.by(Month).map(_.toString).toList shouldBe List("2016-01", "2016-02", "2016-03")
    range.contains(Day(2016, 3, 31)) shouldBe true
    range.contains(Day(2016, 4, 1)) shouldBe false
  }

  test("ordering and equality distinguish kinds") {
    (Day(2016, 8, 1) < Day(2016, 8, 2)) shouldBe true
    Month(2016, 8) should not be Day(2016, 8, 1) // same start, different kind
    Seq(Day(2016, 8, 3), Day(2016, 8, 1), Day(2016, 8, 2)).sorted.head shouldBe Day(2016, 8, 1)
  }

  test("format with custom patterns") {
    Day(2016, 8, 28).format("yyyy/MM/dd") shouldBe "2016/08/28"
    Day(2016, 8, 28).format("'date='yyyy-MM-dd") shouldBe "date=2016-08-28"
  }

  test("epoch conversions are UTC midnight") {
    Day(1970, 1, 2).from shouldBe 86400000L
    Day(1970, 1, 2).asDate.getTime shouldBe 86400000L
  }

  test("interval types re-express intervals at their granularity") {
    Month(Week(2016, 1)) shouldBe Month(2016, 1)
    Year(Day(2016, 8, 11)) shouldBe Year(2016)
    Day(0L) shouldBe Day(1970, 1, 1)
  }
}
