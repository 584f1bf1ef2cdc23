package graft.engine

/** DuckDB-dialect → Spark translation helpers (SURVEY.md §2.8, §7.0).
  * Pure functions, property-tested in DialectSpec.
  */
object Dialect {

  /** Full DuckDB-dialect → Spark-SQL text rewrite, applied by the
    * Gateway before parsing (SURVEY.md §3.5). String literals and quoted
    * identifiers are never rewritten. Handles:
    *   - `QUALIFY pred`  →  subquery + WHERE (no Spark QUALIFY)
    *   - `a // b`        →  `a div b` (integer floor division)
    *   - `x GLOB 'pat'`  →  `x RLIKE '<glob-as-regex>'`
    *   - `j ->> 'path'`  →  `get_json_object(j, '$.path')`
    *   - `duckdb_tables()` etc. → the same-named Gateway catalog views
    *     (reference smoke query, /root/reference/main.go:77)
    */
  def rewrite(sql: String): String =
    rewriteCatalogFns(rewriteQualify(rewriteOperators(normalizeWs(sql))))

  private val catalogFnRe =
    """(?i)^(duckdb_(?:extensions|tables|functions|views|settings))\s*\(\s*\)""".r

  /** `duckdb_tables()` → `duckdb_tables`, outside string literals only
    * (a literal '…duckdb_tables()…' must survive verbatim).
    */
  private def rewriteCatalogFns(sql: String): String =
    scanOutsideLiterals(sql) { (i, sb) =>
      if (sql.regionMatches(true, i, "duckdb_", 0, 7) &&
        (i == 0 || !Character.isLetterOrDigit(sql.charAt(i - 1)))) {
        catalogFnRe.findPrefixMatchOf(sql.substring(i)) match {
          case Some(m) => sb.append(m.group(1).toLowerCase); i + m.end
          case None => i
        }
      } else i
    }

  /** Collapse whitespace runs to single spaces outside literals so the
    * keyword scanners below see a canonical form (newlines before
    * QUALIFY etc.).
    */
  private def normalizeWs(sql: String): String =
    scanOutsideLiterals(sql) { (i, sb) =>
      if (sql.charAt(i).isWhitespace) {
        var j = i
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        sb.append(' '); j
      } else i
    }

  /** Scan positions outside single-quoted strings / double-quoted idents. */
  private def scanOutsideLiterals(sql: String)(f: (Int, StringBuilder) => Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"') {
        val q = c
        sb.append(c); i += 1
        while (i < sql.length && sql.charAt(i) != q) { sb.append(sql.charAt(i)); i += 1 }
        if (i < sql.length) { sb.append(q); i += 1 }
      } else {
        val advanced = f(i, sb)
        if (advanced > i) i = advanced
        else { sb.append(c); i += 1 }
      }
    }
    sb.toString
  }

  private val globRe =
    """(?i)\bGLOB\s+'([^']*)'""".r
  private val arrowRe =
    """(\w+(?:\.\w+)*)\s*->>\s*'([^']*)'""".r

  private def rewriteOperators(sql: String): String = {
    // `//` → ` div ` (outside literals)
    val noIntDiv = scanOutsideLiterals(sql) { (i, sb) =>
      if (sql.startsWith("//", i)) { sb.append(" div "); i + 2 } else i
    }
    // GLOB 'pat' → RLIKE '<regex>' (pattern is a literal, so the regex
    // can be precomputed)
    val noGlob = globRe.replaceAllIn(noIntDiv, m =>
      java.util.regex.Matcher.quoteReplacement(
        "RLIKE '" + globToRegex(m.group(1)).replace("'", "''") + "'"))
    // j ->> 'k' → get_json_object(j, '$.k')
    arrowRe.replaceAllIn(noGlob, m => {
      val path0 = m.group(2)
      val path = if (path0.startsWith("$")) path0 else "$." + path0
      java.util.regex.Matcher.quoteReplacement(
        s"get_json_object(${m.group(1)}, '$path')")
    })
  }

  /** `SELECT <list> FROM … QUALIFY pred [tail]` →
    * `SELECT * EXCEPT (__q) FROM (SELECT <list>, (pred) AS __q FROM …)
    *  WHERE __q [tail]`. Handles the common trailing-clause form (the
    * declared-query surface); nested QUALIFY inside subqueries is
    * rewritten innermost-first by repeated application.
    */
  private def rewriteQualify(sql: String): String = {
    val up = sql.toUpperCase
    val qi = indexOfTopLevel(sql, " QUALIFY ")
    if (qi < 0) return sql
    // head = everything before QUALIFY; find tail start (ORDER BY/LIMIT
    // at top level after the predicate)
    val head = sql.substring(0, qi)
    val rest = sql.substring(qi + " QUALIFY ".length)
    val tailIdx = Seq(" ORDER BY ", " LIMIT ", " OFFSET ")
      .map(k => indexOfTopLevel(rest, k)).filter(_ >= 0)
      .sorted.headOption.getOrElse(rest.length)
    val pred = rest.substring(0, tailIdx).trim
    val tail = rest.substring(tailIdx)
    // inject `, (pred) AS __q` at the end of the head's select list =
    // just before its top-level FROM
    val fi = indexOfTopLevel(head, " FROM ")
    require(fi >= 0, "QUALIFY rewrite: no FROM clause found")
    val withQ = head.substring(0, fi) + s", ($pred) AS __q" + head.substring(fi)
    s"SELECT * EXCEPT (__q) FROM ($withQ) WHERE __q$tail"
  }

  /** First index of `needle` (case-insensitive) at paren depth 0 and
    * outside literals; -1 if absent.
    */
  private def indexOfTopLevel(sql: String, needle: String): Int = {
    val up = sql.toUpperCase
    val n = needle.toUpperCase
    var depth = 0
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' | '"' =>
          val q = sql.charAt(i); i += 1
          while (i < sql.length && sql.charAt(i) != q) i += 1
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && up.startsWith(n, i)) return i
      }
      i += 1
    }
    -1
  }

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
