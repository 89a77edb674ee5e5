package graft.sources

/** Fixed-year CF calendars — `noleap`/`365_day`, `all_leap`/`366_day`,
  * and `360_day` — the calendars CMIP-class climate archives encode
  * their time axes in. These cannot map onto datetime64 (epoch-ns
  * assumes the real Gregorian year structure), so coordinates stay RAW
  * CF counts and calendar arithmetic runs on the calendar's OWN
  * timeline. An instant is a [[CfCalendar.CalInstant]]: whole days
  * since year 0, month 1, day 1 in that calendar, plus nanoseconds
  * within the day — two Longs, so year-2000-era dates never overflow
  * (a single ns counter would overflow past ~year 292). Every year has
  * the same length, so all field math is closed-form integer
  * arithmetic — no table walks, no java.time. The reference gets these
  * for free through xarray.open_zarr's decode_cf → cftime objects
  * (xarray_beam zarr.py:72-96); this is the Spark-side equivalent for
  * the fields/periods the engine derives (year, month, day, hour,
  * dayofyear, season; resample period starts).
  *
  * `julian` and other variable-year calendars are NOT supported and
  * must stay loudly rejected by callers: their leap structure differs
  * from anything closed-form here, and a silent mis-decode would be a
  * wrong read.
  */
object CfCalendar {

  val DayNs: Long = 86400L * 1000000000L
  val HourNs: Long = 3600L * 1000000000L

  /** A calendar-timeline instant: whole days since year 0-01-01 in the
    * calendar, plus ns within the day (always in [0, DayNs)). */
  final case class CalInstant(days: Long, nsOfDay: Long) {
    require(nsOfDay >= 0 && nsOfDay < DayNs, s"nsOfDay $nsOfDay out of range")
  }

  /** Calendar names accepted (CF spelling variants normalize). */
  def isSupported(cal: String): Boolean = cal.toLowerCase match {
    case "noleap" | "365_day" | "all_leap" | "366_day" | "360_day" => true
    case _ => false
  }

  /** Canonical name: noleap / all_leap / 360_day. */
  def normalize(cal: String): String = cal.toLowerCase match {
    case "noleap" | "365_day" => "noleap"
    case "all_leap" | "366_day" => "all_leap"
    case "360_day" => "360_day"
    case other => throw new IllegalArgumentException(
      s"unsupported CF calendar '$other' (noleap/365_day, " +
        "all_leap/366_day, 360_day)")
  }

  private val M365 = Array(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
  private val M366 = Array(31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
  private val M360 = Array.fill(12)(30)

  def monthLengths(cal: String): Array[Int] = normalize(cal) match {
    case "noleap" => M365
    case "all_leap" => M366
    case "360_day" => M360
  }

  def yearDays(cal: String): Int = normalize(cal) match {
    case "noleap" => 365
    case "all_leap" => 366
    case "360_day" => 360
  }

  /** Cumulative days before each month (13 entries, cum(0)=0). */
  private def cumDays(cal: String): Array[Int] =
    monthLengths(cal).scanLeft(0)(_ + _)

  /** Whole days from the calendar origin (year 0-01-01) to (y, mo, d).
    * Validates month/day against the calendar's own month lengths —
    * 2000-02-30 IS a valid 360_day date. */
  def daysFromYMD(cal: String, y: Long, mo: Int, d: Int): Long = {
    val ml = monthLengths(cal)
    require(mo >= 1 && mo <= 12, s"month $mo out of range in $cal")
    require(d >= 1 && d <= ml(mo - 1),
      s"day $d out of range for month $mo in $cal " +
        s"(month has ${ml(mo - 1)} days)")
    math.addExact(math.multiplyExact(y, yearDays(cal).toLong),
      (cumDays(cal)(mo - 1) + (d - 1)).toLong)
  }

  /** Instant of (y, mo, d, h, mi, s) + fractional-second ns. */
  def instant(cal: String, y: Long, mo: Int, d: Int, h: Int, mi: Int,
              sec: Int, fracNs: Long): CalInstant = {
    require(h >= 0 && h <= 23 && mi >= 0 && mi <= 59 && sec >= 0 && sec <= 60,
      s"time-of-day $h:$mi:$sec out of range")
    addNs(CalInstant(daysFromYMD(cal, y, mo, d), 0L),
      (h * 3600L + mi * 60L + sec) * 1000000000L + fracNs)
  }

  /** Instant + a signed ns offset, renormalized. */
  def addNs(t: CalInstant, ns: Long): CalInstant = {
    val total = math.addExact(t.nsOfDay, Math.floorMod(ns, DayNs))
    val carry = Math.floorDiv(ns, DayNs) + total / DayNs
    CalInstant(math.addExact(t.days, carry), total % DayNs)
  }

  /** Exact signed ns between two instants (loud on astronomical
    * spans — real archives span decades, which fit with ease). */
  def nsBetween(a: CalInstant, b: CalInstant): Long =
    math.addExact(
      math.multiplyExact(math.subtractExact(a.days, b.days), DayNs),
      a.nsOfDay - b.nsOfDay)

  /** (year, month 1-12, day 1-31) of an instant. */
  def ymd(cal: String, t: CalInstant): (Long, Int, Int) = {
    val yd = yearDays(cal)
    val year = Math.floorDiv(t.days, yd)
    var doy = Math.floorMod(t.days, yd).toInt // 0-based
    val ml = monthLengths(cal)
    var mo = 0
    while (doy >= ml(mo)) { doy -= ml(mo); mo += 1 }
    (year, mo + 1, doy + 1)
  }

  /** Calendar field of an instant — the xarray `'time.<field>'`
    * accessors that are well-defined on fixed-year calendars.
    * `dayofweek` is deliberately absent: a 7-day week does not tile
    * any of these years, and cftime's continuous-count weekday anchor
    * is not something to guess at — callers reject it loudly. */
  def fieldOf(cal: String, t: CalInstant, field: String): Long = {
    val (y, mo, d) = ymd(cal, t)
    field match {
      case "year" => y
      case "month" => mo.toLong
      case "day" => d.toLong
      case "hour" => t.nsOfDay / HourNs
      case "dayofyear" => Math.floorMod(t.days, yearDays(cal)) + 1L
      case "season" => (mo % 12) / 3L // DJF=0 MAM=1 JJA=2 SON=3
      case other => throw new IllegalArgumentException(
        s"time field '$other' is not defined on CF calendar $cal " +
          "(year/month/day/hour/dayofyear/season)")
    }
  }

  /** Instant of the period start containing `t` —
    * [[graft.api.XbeamDataset.periodStartNs]]'s calendar twin. `week`
    * is absent for the same reason as dayofweek. */
  def periodStart(cal: String, period: String, t: CalInstant): CalInstant = {
    val (y, mo, _) = ymd(cal, t)
    period match {
      case "year" => CalInstant(daysFromYMD(cal, y, 1, 1), 0L)
      case "quarter" =>
        CalInstant(daysFromYMD(cal, y, (mo - 1) / 3 * 3 + 1, 1), 0L)
      case "month" => CalInstant(daysFromYMD(cal, y, mo, 1), 0L)
      case "day" => CalInstant(t.days, 0L)
      case "hour" => CalInstant(t.days, t.nsOfDay / HourNs * HourNs)
      case other => throw new IllegalArgumentException(
        s"resample period '$other' is not defined on CF calendar $cal " +
          "(year/quarter/month/day/hour)")
    }
  }
}
