package graft.etl

import graft.time.{DateInterval, Day, Month, Quarter, Year}

/**
 * A lazy sequence of monotonically decreasing dates (newest first) describing
 * when a job should run. Composable (`and`, `where`) into more complex plans;
 * iteration deduplicates and enforces the decreasing order even after
 * composition (reference core Schedule.scala:58-91).
 *
 * {{{
 * scala> Schedule.iterate(Day(2016, 7, 2)).take(3).toList
 * res1: List[DateInterval] = List(2016-07-02, 2016-07-01, 2016-06-30)
 * }}}
 */
case class Schedule(dates: LazyList[DateInterval]) extends Iterable[DateInterval] {

  override def iterator: Iterator[DateInterval] = new Iterator[DateInterval] {
    private var remaining = dates
    def hasNext: Boolean = remaining.nonEmpty
    def next(): DateInterval = {
      val head = remaining.head
      remaining = remaining.tail.dropWhile(_ >= head)
      head
    }
  }

  /** Merge another schedule's dates after this one's. */
  def and(that: Schedule): Schedule = Schedule(dates #::: that.dates)

  /** Keep only leading dates satisfying the predicate (e.g. backfill floor). */
  def where(predicate: DateInterval => Boolean): Schedule = Schedule(dates.takeWhile(predicate))
}

object Schedule {
  val empty: Schedule = Schedule(LazyList.empty)

  def apply(date: DateInterval): Schedule = Schedule(LazyList(date))

  /** Endless schedule walking backwards from `interval` (today, yesterday, ...). */
  def iterate(interval: DateInterval): Schedule = Schedule(LazyList.iterate(interval)(_.prev))
}

/**
 * DSL mixed into runners for declaring schedules:
 *
 * {{{
 * val schedule = today and monthly
 * val backfill = daily where (_ >= Day(2016, 4, 12))
 * }}}
 */
trait ScheduleDsl {
  def today: Schedule = Schedule(Day.today)
  def daily: Schedule = Schedule.iterate(Day.today)
  def monthly: Schedule = Schedule.iterate(Month.today)
  def quarterly: Schedule = Schedule.iterate(Quarter.today)
  def yearly: Schedule = Schedule.iterate(Year.today)
}
