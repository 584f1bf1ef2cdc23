package graft.engine.expressions

import java.text.BreakIterator
import java.time.LocalDateTime
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField
import java.util.Locale
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.unsafe.types.UTF8String

/** Null-safe static kernels for the round-10 function-surface audit
  * (tools/audit_functions.py) — invoked via StaticInvoke from the
  * Functions registry. Semantics pinned against DuckDB 1.0:
  *
  *  - grapheme family: DuckDB counts/slices GRAPHEME CLUSTERS, not code
  *    points (`length_grapheme('héllo')` with a combining accent is 5
  *    where `length` counts 6). JDK `BreakIterator.getCharacterInstance`
  *    is the same UAX#29 segmentation.
  *  - bit-string family: `bin('abc')`/`to_binary` on VARCHAR render the
  *    UTF-8 BYTES as a bit string ('011000010110001001100011').
  *  - strptime: DuckDB defaults ABSENT datetime fields to
  *    1900-01-01 00:00:00 (C strptime's struct tm epoch), not 1970 —
  *    `strptime('05/03', '%d/%m')` is 1900-03-05. JDK formatters are
  *    built with parseDefaulting on every field (defaults apply only
  *    when the pattern leaves the field unparsed) and cached.
  *  - icu sort keys: `icu_sort_key(s, locale)` (and the ~150
  *    `icu_collate_<loc>` sugar forms the dialect rewrites onto it)
  *    returns the collator sort key as uppercase hex. Key BYTES are
  *    collation-library-specific (JDK vs DuckDB's bundled ICU), so the
  *    contract is ordering-compatibility, not byte equality — documented
  *    in SURVEY §5.3's audit notes.
  */
object TextKernels {

  // ---- grapheme clusters ----

  private def clusters(s: String): IndexedSeq[(Int, Int)] = {
    val it = BreakIterator.getCharacterInstance(Locale.ROOT)
    it.setText(s)
    val out = IndexedSeq.newBuilder[(Int, Int)]
    var start = it.first()
    var end = it.next()
    while (end != BreakIterator.DONE) {
      out += ((start, end))
      start = end
      end = it.next()
    }
    out.result()
  }

  def lengthGrapheme(s: UTF8String): java.lang.Long =
    if (s == null) null else java.lang.Long.valueOf(clusters(s.toString).length.toLong)

  def leftGrapheme(s: UTF8String, n: Long): UTF8String = {
    if (s == null) return null
    val str = s.toString
    val cl = clusters(str)
    // negative n drops |n| clusters from the right (DuckDB left())
    val k = if (n >= 0) math.min(n, cl.length.toLong).toInt
    else math.max(0L, cl.length + n).toInt
    UTF8String.fromString(if (k == 0) "" else str.substring(0, cl(k - 1)._2))
  }

  def rightGrapheme(s: UTF8String, n: Long): UTF8String = {
    if (s == null) return null
    val str = s.toString
    val cl = clusters(str)
    val k = if (n >= 0) math.min(n, cl.length.toLong).toInt
    else math.max(0L, cl.length + n).toInt
    UTF8String.fromString(
      if (k == 0) "" else str.substring(cl(cl.length - k)._1))
  }

  /** 1-based cluster start, cluster count — DuckDB substring semantics
    * (negative start counts from the end like substring). */
  def substringGrapheme(s: UTF8String, start: Long, len: Long): UTF8String = {
    if (s == null) return null
    val str = s.toString
    val cl = clusters(str)
    val n = cl.length
    val from0 = if (start > 0) start - 1 else if (start < 0) n + start else 0L
    val lo = math.max(0L, from0)
    val hi = math.min(n.toLong, math.max(lo, from0 + math.max(0L, len)))
    UTF8String.fromString(
      if (lo >= hi) "" else str.substring(cl(lo.toInt)._1, cl(hi.toInt - 1)._2))
  }

  // ---- bit strings ----

  def bitsOfString(s: UTF8String): UTF8String = {
    if (s == null) return null
    val bytes = s.getBytes
    val sb = new java.lang.StringBuilder(bytes.length * 8)
    bytes.foreach { b =>
      var i = 7
      while (i >= 0) { sb.append(if (((b >> i) & 1) == 1) '1' else '0'); i -= 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  /** unbin/from_binary: bit text → BLOB bytes (inverse of
    * bitsOfString); length must be a multiple of 8, like DuckDB. */
  def bytesFromBits(s: UTF8String): Array[Byte] = {
    if (s == null) return null
    val str = s.toString
    require(str.length % 8 == 0 && str.forall(c => c == '0' || c == '1'),
      s"unbin: bit string length must be a multiple of 8 of 0/1 digits, got '$str'")
    str.grouped(8).map(g => Integer.parseInt(g, 2).toByte).toArray
  }

  // ---- strptime with C-epoch (1900) field defaults ----

  private val fmtCache = new ConcurrentHashMap[String, DateTimeFormatter]()

  private def formatter(pattern: String): DateTimeFormatter =
    fmtCache.computeIfAbsent(pattern, p => {
      // 'xxx' marks %z: C strptime (and DuckDB) accept +02, +0230 AND
      // +02:30, which no single JDK offset pattern does — try the three
      // strict forms as sequential optionals (first match consumes the
      // text; if none match the trailing-text check errors, except for
      // the lax missing-offset-at-end edge, accepted as naive)
      val b = new DateTimeFormatterBuilder()
      val parts = p.split("xxx", -1)
      parts.zipWithIndex.foreach { case (part, idx) =>
        if (idx > 0)
          b.optionalStart().appendOffset("+HH:MM", "Z").optionalEnd()
            .optionalStart().appendOffset("+HHMM", "Z").optionalEnd()
            .optionalStart().appendOffset("+HH", "Z").optionalEnd()
        if (part.nonEmpty) b.appendPattern(part)
      }
      b.toFormatter(Locale.US)
    })

  /** Epoch micros of the parsed NAIVE datetime; throws on mismatch
    * (strptime errors loudly in DuckDB; try_strptime wraps in TryEval).
    *
    * Parses UNRESOLVED and assembles the datetime from the raw fields —
    * C struct-tm semantics, which the JDK resolver cannot express
    * (ADVICE r10, verified against DuckDB 1.0):
    *  - absent fields default to 1900-01-01 00:00:00 without "Conflict
    *    found" errors when a sibling field (am/pm hour, 'S' fractions)
    *    resolves the same ChronoField another way;
    *  - day-of-year (%j) and weekday (%a/%A) parse but are IGNORED,
    *    like mktime ignores tm_yday/tm_wday — strptime('2023-100',
    *    '%Y-%j') is 2023-01-01, a weekday mismatching the date is fine;
    *  - two-digit %y pivots at 69 (00-68 → 20xx, 69-99 → 19xx), not
    *    the JDK's 2000-2099 window;
    *  - a bare %p gives 12:00 for PM; %I without %p keeps 1-12 on the
    *    morning side (clock-hour 12 → 0);
    *  - a parsed UTC offset (%z) SHIFTS the result to UTC (DuckDB
    *    renders the instant at +00).
    * Field RANGE errors stay loud: LocalDateTime.of rejects month 13
    * etc., matching DuckDB's parse error. */
  def strptimeMicros(s: UTF8String, jdkPattern: UTF8String): java.lang.Long = {
    if (s == null || jdkPattern == null) return null
    val text = s.toString
    val pat = jdkPattern.toString
    val pos = new java.text.ParsePosition(0)
    val ta = formatter(pat).parseUnresolved(text, pos)
    if (ta == null || pos.getErrorIndex >= 0 || pos.getIndex != text.length)
      throw new IllegalArgumentException(
        s"strptime: could not parse '$text'")
    def f(cf: ChronoField, d: Long): Long =
      if (ta.isSupported(cf)) ta.getLong(cf) else d
    var year = f(ChronoField.YEAR_OF_ERA, f(ChronoField.YEAR, 1900L))
    // bare 'yy' parses through the JDK's reduced-value window
    // [2000, 2099]; re-pivot to C's 69 rule
    if (year >= 2069 && year <= 2099 &&
        """(?<!y)yy(?!y)""".r.findFirstIn(pat.replaceAll("'[^']*'", "")).isDefined)
      year -= 100
    val ampm = f(ChronoField.AMPM_OF_DAY, -1L)
    val hour =
      if (ta.isSupported(ChronoField.HOUR_OF_DAY)) ta.getLong(ChronoField.HOUR_OF_DAY)
      else if (ta.isSupported(ChronoField.CLOCK_HOUR_OF_AMPM)) {
        val h = ta.getLong(ChronoField.CLOCK_HOUR_OF_AMPM) % 12
        if (ampm == 1L) h + 12 else h
      } else if (ta.isSupported(ChronoField.HOUR_OF_AMPM)) {
        val h = ta.getLong(ChronoField.HOUR_OF_AMPM)
        if (ampm == 1L) h + 12 else h
      } else if (ampm >= 0L) ampm * 12
      else 0L
    val nano = f(ChronoField.NANO_OF_SECOND,
      f(ChronoField.MICRO_OF_SECOND, 0L) * 1000L)
    val dt = LocalDateTime.of(year.toInt,
      f(ChronoField.MONTH_OF_YEAR, 1L).toInt,
      f(ChronoField.DAY_OF_MONTH, 1L).toInt, hour.toInt,
      f(ChronoField.MINUTE_OF_HOUR, 0L).toInt,
      f(ChronoField.SECOND_OF_MINUTE, 0L).toInt, nano.toInt)
    val micros = dt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
      dt.getNano / 1000L
    java.lang.Long.valueOf(micros - f(ChronoField.OFFSET_SECONDS, 0L) * 1000000L)
  }

  /** list_<stat> macro family (r10 audit stage 3): one kernel over the
    * list cast to DOUBLE[], NULL elements skipped, NULL below each
    * statistic's minimum count — semantics mirror the engine's scalar
    * aggregates (sem = stddev_pop/√n; skewness/kurtosis bias-corrected
    * sample forms; kurtosis_pop population excess; entropy base-2;
    * median/mad interpolated at even counts; product in DOUBLE). */
  def listStat(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      mode: UTF8String): java.lang.Double = {
    if (arr == null || mode == null) return null
    val xs = (0 until arr.numElements())
      .filterNot(arr.isNullAt).map(arr.getDouble).toArray
    val n = xs.length.toDouble
    def mean = xs.sum / n
    def m(k: Int) = { val mu = mean; xs.map(x => math.pow(x - mu, k)).sum / n }
    def varPop = m(2)
    def varSamp = m(2) * n / (n - 1)
    def sortedMedian(a: Array[Double]): Double = {
      val s = a.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val out: Option[Double] = mode.toString match {
      case _ if xs.isEmpty => None
      case "sum" => Some(xs.sum)
      case "avg" => Some(mean)
      case "product" => Some(xs.product)
      case "median" => Some(sortedMedian(xs))
      case "mad" =>
        val med = sortedMedian(xs); Some(sortedMedian(xs.map(x => math.abs(x - med))))
      case "var_pop" => Some(varPop)
      case "var_samp" => if (n < 2) None else Some(varSamp)
      case "stddev_pop" => Some(math.sqrt(varPop))
      case "stddev_samp" => if (n < 2) None else Some(math.sqrt(varSamp))
      case "sem" => Some(math.sqrt(varPop) / math.sqrt(n))
      case "skewness" =>
        if (n < 3 || varPop == 0) None
        else Some((m(3) / math.pow(varPop, 1.5)) *
          math.sqrt(n * (n - 1)) / (n - 2))
      case "kurtosis" =>
        if (n < 4 || varPop == 0) None
        else Some(((n - 1) / ((n - 2) * (n - 3))) *
          ((n + 1) * (m(4) / (varPop * varPop) - 3.0) + 6.0))
      case "kurtosis_pop" =>
        if (varPop == 0) None else Some(m(4) / (varPop * varPop) - 3.0)
      case "entropy" =>
        val counts = xs.groupBy(identity).values.map(_.length.toDouble)
        Some(-counts.map(c => (c / n) * (math.log(c / n) / math.log(2.0))).sum)
      case other => throw new IllegalArgumentException(
        s"listStat: unknown statistic '$other'")
    }
    out.map(java.lang.Double.valueOf).orNull
  }

  /** pg_size_pretty: DuckDB renders binary units with one decimal
    * ('3 bytes', '10.0 KiB', '1.0 MiB'). */
  def sizePretty(n: Long): UTF8String = {
    val units = Seq("bytes", "KiB", "MiB", "GiB", "TiB", "PiB")
    var v = math.abs(n.toDouble)
    var u = 0
    while (v >= 1024.0 && u < units.length - 1) { v /= 1024.0; u += 1 }
    val sign = if (n < 0) "-" else ""
    UTF8String.fromString(
      if (u == 0) s"$sign${math.abs(n)} ${units(0)}"
      else f"$sign$v%.1f ${units(u)}")
  }

  // ---- collation sort keys ----

  def icuSortKey(s: UTF8String, locale: UTF8String): UTF8String = {
    if (s == null || locale == null) return null
    val loc = Locale.forLanguageTag(locale.toString.replace('_', '-'))
    val key = java.text.Collator.getInstance(loc)
      .getCollationKey(s.toString).toByteArray
    UTF8String.fromString(key.map("%02X".format(_)).mkString)
  }
}
