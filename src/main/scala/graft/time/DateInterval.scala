package graft.time

import java.time._
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder, SignStyle}
import java.time.temporal.{ChronoField, IsoFields}
import java.util.Locale

import scala.util.Try

/**
 * A calendar-aligned, half-open date interval: `[start, end)`.
 *
 * May 2014 is `from = 2014-05-01`, `end = 2014-06-01`. Built on `java.time`
 * (the reference uses `java.util.Calendar`, reference core DateInterval.scala:38-359)
 * with ISO-8601 week semantics: weeks start Monday and week 1 is the week
 * containing the first Thursday of the year.
 *
 * {{{
 * scala> Seq(Day(2016, 8, 11), Week(2016, 32), Month(2016, 8), Quarter(2016, Quarter.Q3), Year(2016))
 * res1: Seq[DateInterval] = List(2016-08-11, 2016-W32, 2016-08, 2016-Q3, 2016)
 * scala> Week(Day(2008, 12, 29))          // ISO week-year edge case
 * res2: DateInterval = 2009-W01
 * }}}
 */
final class DateInterval private[time] (
    val start: LocalDate,
    val kind: DateIntervalType,
    val endOpt: Option[DateInterval] = None)
    extends Ordered[DateInterval]
    with Serializable {

  /** Start of the interval as epoch milliseconds at UTC midnight. */
  def from: Long = start.atStartOfDay(DateInterval.UTC).toInstant.toEpochMilli

  /** Exclusive upper bound; for plain intervals this is [[next]]. */
  def end: DateInterval = endOpt.getOrElse(next)

  /**
   * A custom range from this interval's start to `other` (exclusive).
   *
   * {{{
   * scala> (Day(2016, 8, 11) to Day(2016, 8, 29)).by(Day).size
   * res1: Int = 18
   * }}}
   */
  def to(other: DateInterval): DateInterval =
    if (endOpt.forall(_ < other)) new DateInterval(start, kind, Some(other)) else this

  def +(delta: Int): DateInterval = new DateInterval(kind.truncate(kind.advance(start, delta)), kind)
  def -(delta: Int): DateInterval = this + (-delta)

  /** The preceding interval of the same kind (May -> April). */
  def prev: DateInterval = this - 1

  /** The following interval of the same kind (2014 -> 2015). */
  def next: DateInterval = this + 1

  /** True when `date` starts within this half-open interval. */
  def contains(date: DateInterval): Boolean = this <= date && date < end

  /**
   * Iterate the sub-intervals of the given kind covering this interval.
   *
   * {{{
   * scala> Week(2016, 11).by(Day).size
   * res1: Int = 7
   * }}}
   */
  def by(sub: DateIntervalType): Iterable[DateInterval] = {
    val bound = end.from
    LazyList.iterate(sub(this))(_.next).takeWhile(_.from < bound)
  }

  def asDate: java.sql.Date = new java.sql.Date(from)
  def asTimestamp: java.sql.Timestamp = new java.sql.Timestamp(from)
  def asLocalDate: LocalDate = start

  /** Format the interval start with a `DateTimeFormatter`-style pattern. */
  def format(pattern: String): String =
    DateInterval.patternFormatter(pattern).format(start.atStartOfDay(DateInterval.UTC)) +
      endOpt.fold("")(":" + _.toString)

  override def compare(that: DateInterval): Int = start.compareTo(that.start)

  override def equals(other: Any): Boolean = other match {
    case that: DateInterval =>
      kind == that.kind && endOpt == that.endOpt && start == that.start
    case _ => false
  }

  override def hashCode: Int = (start, kind, endOpt).hashCode

  override def toString: String =
    kind.defaultFormat(start) + endOpt.fold("")(":" + _.toString)
}

object DateInterval {
  val UTC: ZoneId = ZoneOffset.UTC

  /**
   * `Locale.UK` gives ISO-8601 week numbering for the locale-sensitive
   * `Y`/`w` pattern letters (Monday first day, 4-day minimal week).
   */
  private[time] def patternFormatter(pattern: String): DateTimeFormatter =
    DateTimeFormatter.ofPattern(pattern, Locale.UK).withZone(UTC)
}

/**
 * One per interval granularity (Day/Week/Month/Quarter/Year). Constructs
 * intervals, truncates dates to the interval boundary, and formats/parses
 * the canonical textual form.
 */
sealed abstract class DateIntervalType(val name: String) extends Serializable {

  /** Truncate a date to this granularity's boundary (months -> 1st, weeks -> Monday, ...). */
  private[time] def truncate(date: LocalDate): LocalDate

  /** Move a (truncated) date by `n` units of this granularity. */
  private[time] def advance(date: LocalDate, n: Int): LocalDate

  private[time] def defaultFormat(date: LocalDate): String
  private[time] def defaultParse(input: String): LocalDate

  /** Re-express any interval at this granularity, truncating finer fields. */
  def apply(date: DateInterval): DateInterval = of(date.start)

  /** Interval containing the given epoch-millisecond timestamp. */
  def apply(timestamp: Long): DateInterval =
    of(Instant.ofEpochMilli(timestamp).atZone(DateInterval.UTC).toLocalDate)

  /** Interval containing today (UTC). */
  def today: DateInterval = apply(System.currentTimeMillis())

  /** Parse the canonical form, e.g. "2015-05-07", "2016-W01", "2016-Q4". */
  def parse(input: String): Option[DateInterval] =
    Try(defaultParse(input)).toOption.map(of)

  private[time] def of(date: LocalDate): DateInterval = new DateInterval(truncate(date), this)
}

object Day extends DateIntervalType("day") {
  private val fmt = DateTimeFormatter.ISO_LOCAL_DATE

  def apply(year: Int, month: Int, day: Int): DateInterval = of(LocalDate.of(year, month, day))

  private[time] def truncate(date: LocalDate): LocalDate = date
  private[time] def advance(date: LocalDate, n: Int): LocalDate = date.plusDays(n.toLong)
  private[time] def defaultFormat(date: LocalDate): String = fmt.format(date)
  private[time] def defaultParse(input: String): LocalDate = LocalDate.parse(input, fmt)
}

/**
 * ISO-8601 week. Counterintuitive around new year: Monday 29 December 2008 is
 * week 2009-W01 and Sunday 3 January 2010 is in week 2009-W53.
 */
object Week extends DateIntervalType("week") {
  sealed abstract class WeekDay(val dayOfWeek: DayOfWeek)
  case object Monday extends WeekDay(DayOfWeek.MONDAY)
  case object Tuesday extends WeekDay(DayOfWeek.TUESDAY)
  case object Wednesday extends WeekDay(DayOfWeek.WEDNESDAY)
  case object Thursday extends WeekDay(DayOfWeek.THURSDAY)
  case object Friday extends WeekDay(DayOfWeek.FRIDAY)
  case object Saturday extends WeekDay(DayOfWeek.SATURDAY)
  case object Sunday extends WeekDay(DayOfWeek.SUNDAY)

  private val fmt: DateTimeFormatter = new DateTimeFormatterBuilder()
    .appendValue(IsoFields.WEEK_BASED_YEAR, 4, 10, SignStyle.EXCEEDS_PAD)
    .appendLiteral("-W")
    .appendValue(IsoFields.WEEK_OF_WEEK_BASED_YEAR, 2)
    .parseDefaulting(ChronoField.DAY_OF_WEEK, DayOfWeek.MONDAY.getValue.toLong)
    .toFormatter(Locale.UK)
    // SMART (the default) resolves week 53 of a 52-week ISO year by rolling
    // into the next year's W01 — the same leniency apply() validates against
    .withResolverStyle(java.time.format.ResolverStyle.STRICT)

  /** The interval for the ISO week containing the given weekday of (week-year, week). */
  def apply(year: Int, week: Int, dayOfWeek: WeekDay = Monday): DateInterval = {
    require(1 <= week && week <= 53, "week must be between 1-53")
    // adjustInto is lenient: week 53 of a 52-week ISO year would silently
    // roll into the next year's W01 (the reference's non-lenient
    // Calendar.setWeekDate throws instead) — validate against the year's
    // actual week range.
    val weeksInYear =
      IsoFields.WEEK_OF_WEEK_BASED_YEAR.rangeRefinedBy(LocalDate.of(year, 1, 4)).getMaximum
    require(week <= weeksInYear, s"ISO year $year has only $weeksInYear weeks (got week $week)")
    of(
      LocalDate
        .of(year, 1, 4) // Jan 4 is always in ISO week 1
        .`with`(IsoFields.WEEK_OF_WEEK_BASED_YEAR, week.toLong)
        .`with`(ChronoField.DAY_OF_WEEK, dayOfWeek.dayOfWeek.getValue.toLong))
  }

  private[time] def truncate(date: LocalDate): LocalDate =
    date.`with`(ChronoField.DAY_OF_WEEK, DayOfWeek.MONDAY.getValue.toLong)
  private[time] def advance(date: LocalDate, n: Int): LocalDate = date.plusWeeks(n.toLong)
  private[time] def defaultFormat(date: LocalDate): String = fmt.format(date)
  private[time] def defaultParse(input: String): LocalDate = LocalDate.parse(input, fmt)
}

object Month extends DateIntervalType("month") {
  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM", Locale.UK)

  def apply(year: Int, month: Int): DateInterval = of(LocalDate.of(year, month, 1))

  private[time] def truncate(date: LocalDate): LocalDate = date.withDayOfMonth(1)
  private[time] def advance(date: LocalDate, n: Int): LocalDate = date.plusMonths(n.toLong)
  private[time] def defaultFormat(date: LocalDate): String = fmt.format(date)
  private[time] def defaultParse(input: String): LocalDate =
    YearMonth.parse(input, fmt).atDay(1)
}

sealed abstract class Quarter(val firstMonth: Int)

/**
 * Calendar quarters.
 *
 * {{{
 * scala> Year(2017).by(Quarter).toList
 * res1: List[DateInterval] = List(2017-Q1, 2017-Q2, 2017-Q3, 2017-Q4)
 * }}}
 */
object Quarter extends DateIntervalType("quarter") {
  case object Q1 extends Quarter(firstMonth = 1)
  case object Q2 extends Quarter(firstMonth = 4)
  case object Q3 extends Quarter(firstMonth = 7)
  case object Q4 extends Quarter(firstMonth = 10)

  private val QuarterRe = """(\d{4})-Q([1-4])""".r

  def apply(year: Int, quarter: Quarter): DateInterval = of(LocalDate.of(year, quarter.firstMonth, 1))

  private[time] def truncate(date: LocalDate): LocalDate =
    LocalDate.of(date.getYear, ((date.getMonthValue - 1) / 3) * 3 + 1, 1)
  private[time] def advance(date: LocalDate, n: Int): LocalDate = date.plusMonths(3L * n)
  private[time] def defaultFormat(date: LocalDate): String =
    s"${date.getYear}-Q${(date.getMonthValue - 1) / 3 + 1}"
  private[time] def defaultParse(input: String): LocalDate = input match {
    case QuarterRe(year, q) => LocalDate.of(year.toInt, (q.toInt - 1) * 3 + 1, 1)
    case other              => throw new java.time.format.DateTimeParseException("not a quarter", other, 0)
  }
}

object Year extends DateIntervalType("year") {
  def apply(year: Int): DateInterval = of(LocalDate.of(year, 1, 1))

  private[time] def truncate(date: LocalDate): LocalDate = date.withDayOfYear(1)
  private[time] def advance(date: LocalDate, n: Int): LocalDate = date.plusYears(n.toLong)
  private[time] def defaultFormat(date: LocalDate): String = f"${date.getYear}%04d"
  private[time] def defaultParse(input: String): LocalDate = LocalDate.of(input.toInt, 1, 1)
}
