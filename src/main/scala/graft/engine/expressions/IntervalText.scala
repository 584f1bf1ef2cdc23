package graft.engine.expressions

import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/** DuckDB's INTERVAL→VARCHAR rendering (fuzz-found divergence: Spark
  * prints ANSI `INTERVAL '90' MINUTE` / `1 days 2 hours` forms).
  * DuckDB 1.0 pinned:
  *   - `N year[s] N month[s] N day[s]` — singular at |1|, each signed
  *     individually ('-1 year -1 month');
  *   - the sub-day remainder renders as `[-]HH:MM:SS[.frac]` with
  *     trailing fractional zeros trimmed ('00:00:00.5');
  *   - the time field appears when nonzero OR when nothing else does
  *     (zero interval = '00:00:00'), appended after the unit words
  *     ('1 day -01:00:00').
  * Invoked from the IntervalVarcharCast resolution rule via
  * StaticInvoke (codegen-resident).
  */
object IntervalText {

  private def unit(n: Long, name: String): String =
    s"$n $name" + (if (math.abs(n) == 1) "" else "s")

  def render(months: Long, days: Long, micros: Long): UTF8String = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    val years = months / 12
    val remMonths = months % 12
    if (years != 0) parts += unit(years, "year")
    if (remMonths != 0) parts += unit(remMonths, "month")
    if (days != 0) parts += unit(days, "day")
    if (micros != 0 || parts.isEmpty) {
      val sign = if (micros < 0) "-" else ""
      val m = math.abs(micros)
      val h = m / 3600000000L
      val mi = (m % 3600000000L) / 60000000L
      val s = (m % 60000000L) / 1000000L
      val frac = m % 1000000L
      val base = f"$sign$h%02d:$mi%02d:$s%02d"
      parts += (if (frac == 0) base
      else base + ("." + f"$frac%06d").reverse.dropWhile(_ == '0').reverse)
    }
    UTF8String.fromString(parts.mkString(" "))
  }

  def fromCalendar(iv: CalendarInterval): UTF8String =
    render(iv.months.toLong, iv.days.toLong, iv.microseconds)

  /** DayTimeIntervalType carries total microseconds. */
  def fromDayTime(micros: Long): UTF8String = {
    val d = micros / 86400000000L
    render(0L, d, micros - d * 86400000000L)
  }

  /** YearMonthIntervalType carries total months. */
  def fromYearMonth(months: Int): UTF8String =
    render(months.toLong, 0L, 0L)
}
