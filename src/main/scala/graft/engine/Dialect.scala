package graft.engine

/** DuckDB-dialect → Spark translation helpers (SURVEY.md §2.8, §7.0).
  * Pure functions, property-tested in DialectSpec.
  */
object Dialect {

  /** Translate a DuckDB/SQLite GLOB pattern to a Java regex accepted by
    * Spark's `rlike` (SURVEY.md §2.2 P6). GLOB: `*` = any run, `?` = one
    * char, `[...]` = char class (passed through), everything else literal.
    */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      val c = glob.charAt(i)
      c match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          // char class: copy until closing ], honoring leading ! -> ^
          val close = glob.indexOf(']', i + 1)
          if (close < 0) { sb.append("\\["); }
          else {
            val body0 = glob.substring(i + 1, close)
            val body = if (body0.startsWith("!")) "^" + body0.substring(1) else body0
            sb.append('[').append(body).append(']')
            i = close
          }
        case ch if "\\.[]{}()<>+-=!#$^|".indexOf(ch) >= 0 =>
          sb.append('\\').append(ch)
        case ch => sb.append(ch)
      }
      i += 1
    }
    sb.append('$').toString
  }

  /** Translate a C/DuckDB strftime/strptime format string to a JDK
    * DateTimeFormatter pattern for Spark's `date_format`/`to_timestamp`
    * (SURVEY.md §2.8 date/time, §7.4 item 3).
    */
  def strftimeToJava(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    // only letter-bearing literals need quoting (letters are JDK pattern
    // chars); punctuation like '-' / ':' passes through unquoted
    def lit(s: String): Unit = if (s.nonEmpty) {
      if (s.exists(c => c.isLetter || c == '\''))
        sb.append('\'').append(s.replace("'", "''")).append('\'')
      else sb.append(s)
    }
    val plain = new StringBuilder
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        lit(plain.toString); plain.clear()
        fmt.charAt(i + 1) match {
          case 'Y' => sb.append("yyyy")
          case 'y' => sb.append("yy")
          case 'm' => sb.append("MM")
          case 'd' => sb.append("dd")
          case 'H' => sb.append("HH")
          case 'I' => sb.append("hh")
          case 'M' => sb.append("mm")
          case 'S' => sb.append("ss")
          case 'f' => sb.append("SSSSSS") // microseconds
          case 'g' => sb.append("SSS")    // milliseconds (duckdb ext)
          case 'p' => sb.append("a")
          case 'j' => sb.append("DDD")
          case 'a' => sb.append("EEE")
          case 'A' => sb.append("EEEE")
          case 'b' => sb.append("MMM")
          case 'B' => sb.append("MMMM")
          case 'Z' => sb.append("zzz")
          case 'z' => sb.append("xxx")
          case '%' => sb.append("'%'")
          case other => sb.append(other) // unknown: pass through
        }
        i += 2
      } else { plain.append(c); i += 1 }
    }
    lit(plain.toString)
    sb.toString
  }
}
