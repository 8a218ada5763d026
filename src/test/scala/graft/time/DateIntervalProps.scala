package graft.time

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests over the full DateInterval family. */
object DateIntervalProps extends Properties("DateInterval") {

  private val kinds: Seq[DateIntervalType] = Seq(Day, Week, Month, Quarter, Year)

  private val genEpochMs: Gen[Long] =
    Gen.choose(-20000L, 40000L).map(_ * 86400000L) // ~1915..2079

  private val genKind: Gen[DateIntervalType] = Gen.oneOf(kinds)

  private val genInterval: Gen[DateInterval] =
    for { ms <- genEpochMs; kind <- genKind } yield kind(ms)

  property("parse is the inverse of toString") = forAll(genInterval) { interval =>
    val kind = kinds.find(_(interval) == interval).get
    kind.parse(interval.toString).contains(interval)
  }

  property("next/prev are inverse bijections and strictly ordered") =
    forAll(genInterval) { t =>
      t.next.prev == t && t.prev.next == t && t < t.next && t.prev < t
    }

  property("truncation is idempotent") = forAll(genEpochMs, genKind) { (ms, kind) =>
    kind(kind(ms)) == kind(ms)
  }

  property("an interval contains exactly its own days") =
    forAll(genInterval) { t =>
      val days = t.by(Day).toList
      Prop(days.forall(t.contains) &&
        !t.contains(Day(t).prev) && !t.contains(days.last.next))
    }

  property("by(Day) tiles the interval without gaps") = forAll(genInterval) { t =>
    val days = t.by(Day).toList
    days.head == Day(t) &&
    days.zip(days.tail).forall { case (a, b) => a.next == b } &&
    days.last.next == Day(t.end)
  }

  property("weeks start Monday and contain 7 days") = forAll(genEpochMs) { ms =>
    val w = Week(ms)
    w.start.getDayOfWeek == java.time.DayOfWeek.MONDAY && w.by(Day).size == 7
  }

  property("every day belongs to exactly the enclosing interval of each kind") =
    forAll(genEpochMs, genKind) { (ms, kind) =>
      val day = Day(ms)
      val enclosing = kind(day)
      enclosing.contains(day) && !enclosing.next.contains(day) && !enclosing.prev.contains(day)
    }

  property("custom ranges are half-open and tile by their sub-kind") =
    forAll(genEpochMs, Gen.choose(1, 40)) { (ms, n) =>
      val a = Day(ms)
      val range = a to (a + n)
      range.by(Day).size == n && range.contains(a + (n - 1)) && !range.contains(a + n)
    }

  property("epoch round trip: from is UTC midnight of start") =
    forAll(genInterval) { t =>
      java.time.Instant.ofEpochMilli(t.from).atZone(DateInterval.UTC).toLocalDate == t.start
    }
}
