package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

/** Property tests for the fixed-year calendar arithmetic backing the
  * non-Gregorian CF time support: the closed-form (days, nsOfDay) math
  * must satisfy the same invariants cftime's table-driven calendars do
  * — ymd/daysFromYMD round-trip exactly, period starts are idempotent
  * floor operators, and field values stay in range — over the whole
  * plausible CMIP year span including negative years. */
class CfCalendarPropSpec extends AnyFunSuite {

  private val cals = Seq("noleap", "all_leap", "360_day")

  private def checkProp(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n)
        .withInitialSeed(org.scalacheck.rng.Seed(graft.FuzzSeed(202008L))), prop)
    assert(res.passed, res.status.toString)
  }

  private val genCal = Gen.oneOf(cals)
  // instants across years [-5000, 5000] with arbitrary time-of-day
  private def genInstant(cal: String): Gen[CfCalendar.CalInstant] = for {
    y <- Gen.chooseNum(-5000L, 5000L)
    day <- Gen.chooseNum(0, CfCalendar.yearDays(cal) - 1)
    ns <- Gen.chooseNum(0L, CfCalendar.DayNs - 1)
  } yield CfCalendar.CalInstant(y * CfCalendar.yearDays(cal) + day, ns)

  test("ymd <-> daysFromYMD round-trips exactly on every calendar") {
    val gen = for { c <- genCal; t <- genInstant(c) } yield (c, t)
    checkProp(Prop.forAllNoShrink(gen) { case (c, t) =>
      val (y, mo, d) = CfCalendar.ymd(c, t)
      val back = CfCalendar.daysFromYMD(c, y, mo, d)
      val ml = CfCalendar.monthLengths(c)
      (back == t.days) :| s"$c days=${t.days} -> ($y,$mo,$d) -> $back" &&
        (mo >= 1 && mo <= 12 && d >= 1 && d <= ml(mo - 1)) :|
        s"$c ymd out of range: ($y,$mo,$d)"
    }, n = 2000)
  }

  test("period starts: floor operators (start <= t, same period, idempotent)") {
    val periods = Seq("year", "quarter", "month", "day", "hour")
    val gen = for {
      c <- genCal; t <- genInstant(c); p <- Gen.oneOf(periods)
    } yield (c, t, p)
    checkProp(Prop.forAllNoShrink(gen) { case (c, t, p) =>
      val st = CfCalendar.periodStart(c, p, t)
      val again = CfCalendar.periodStart(c, p, st)
      val notAfter = CfCalendar.nsBetween(t, st) >= 0
      // the start is inside the same period as t: every field coarser
      // than or equal to the period matches
      val fieldsMatch = p match {
        case "year" => CfCalendar.fieldOf(c, st, "year") ==
          CfCalendar.fieldOf(c, t, "year")
        case "quarter" | "month" =>
          CfCalendar.fieldOf(c, st, "year") == CfCalendar.fieldOf(c, t, "year") &&
            (p == "quarter" ||
              CfCalendar.fieldOf(c, st, "month") == CfCalendar.fieldOf(c, t, "month"))
        case "day" => st.days == t.days && st.nsOfDay == 0
        case "hour" => st.days == t.days &&
          CfCalendar.fieldOf(c, st, "hour") == CfCalendar.fieldOf(c, t, "hour")
      }
      (st == again) :| s"$c $p not idempotent: $st -> $again" &&
        notAfter :| s"$c $p start after t: $st > $t" &&
        fieldsMatch :| s"$c $p start in a different period: t=$t st=$st"
    }, n = 2000)
  }

  test("addNs/nsBetween invert; fieldOf stays in range") {
    val gen = for {
      c <- genCal; t <- genInstant(c)
      off <- Gen.chooseNum(-400L * 86400, 400L * 86400) // +-400 days, in s
    } yield (c, t, off * 1000000000L)
    checkProp(Prop.forAllNoShrink(gen) { case (c, t, offNs) =>
      val moved = CfCalendar.addNs(t, offNs)
      val doy = CfCalendar.fieldOf(c, moved, "dayofyear")
      val hr = CfCalendar.fieldOf(c, moved, "hour")
      val season = CfCalendar.fieldOf(c, moved, "season")
      (CfCalendar.nsBetween(moved, t) == offNs) :|
        s"$c addNs($t, $offNs) -> $moved does not invert" &&
        (doy >= 1 && doy <= CfCalendar.yearDays(c)) :| s"$c dayofyear $doy" &&
        (hr >= 0 && hr <= 23) :| s"$c hour $hr" &&
        (season >= 0 && season <= 3) :| s"$c season $season"
    }, n = 2000)
  }

  test("month lengths: noleap day-59 is Mar 1; 360_day day-59 is Feb 30") {
    val (yN, moN, dN) = CfCalendar.ymd("noleap",
      CfCalendar.CalInstant(2000L * 365 + 59, 0))
    assert((yN, moN, dN) == ((2000L, 3, 1)))
    val (y3, mo3, d3) = CfCalendar.ymd("360_day",
      CfCalendar.CalInstant(2000L * 360 + 59, 0))
    assert((y3, mo3, d3) == ((2000L, 2, 30)))
    // a 360_day Feb 30 is constructible; a noleap Feb 29 is not
    assert(CfCalendar.daysFromYMD("360_day", 2000, 2, 30) == 2000L * 360 + 59)
    val e = intercept[IllegalArgumentException](
      CfCalendar.daysFromYMD("noleap", 2000, 2, 29))
    assert(e.getMessage.contains("out of range"))
  }
}
