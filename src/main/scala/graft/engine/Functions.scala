package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._

/** DuckDB-dialect function shims registered into Spark's
  * FunctionRegistry (SURVEY.md §2.11) so DuckDB-named SQL runs on the
  * gateway unchanged. Each shim rewrites to resolved Spark built-ins at
  * analysis time — zero runtime overhead, full codegen (no UDFs).
  */
object Functions {

  /** Unresolved call to a Spark builtin; the analyzer resolves it on the
    * next iteration.
    */
  private def call(name: String, args: Seq[Expression]): Expression =
    UnresolvedFunction(Seq(name), args, isDistinct = false)

  private def lam(build: Seq[Expression] => Expression, arity: Int): LambdaFunction = {
    val vars = (0 until arity).map(i => UnresolvedNamedLambdaVariable(Seq(s"v$i")))
    LambdaFunction(build(vars), vars)
  }

  /** name → builder. */
  private val shims: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // ---- list_* → array/HOF builtins (SURVEY §2.8 array family).
    // Lambda-taking shims MUST return the resolved HigherOrderFunction
    // node: the analyzer rejects a LambdaFunction whose parent resolves
    // to another UnresolvedFunction.
    "list_transform" -> { case Seq(l, f: LambdaFunction) => ArrayTransform(l, f) },
    "list_filter" -> { case Seq(l, f: LambdaFunction) => ArrayFilter(l, f) },
    "list_sort" -> (a => call("array_sort", a)),
    "list_reverse_sort" -> (a =>
      call("reverse", Seq(call("array_sort", a)))),
    "list_distinct" -> (a => call("array_distinct", a)),
    "list_contains" -> (a => call("array_contains", a)),
    "list_has" -> (a => call("array_contains", a)),
    "list_concat" -> (a => call("concat", a)),
    "list_cat" -> (a => call("concat", a)),
    "list_unique" -> (a => call("size", Seq(call("array_distinct", a)))),
    "len" -> {
      case Seq(e) => call("length", Seq(e)) // works for strings and arrays
      case a => call("length", a)
    },
    "list_slice" -> { case Seq(l, b, e) =>
      // DuckDB list_slice(l, begin, end) is inclusive; Spark slice takes
      // (start, length)
      call("slice", Seq(l, b, Add(Subtract(e, b), Literal(1))))
    },
    "list_extract" -> (a => call("element_at", a)),
    "list_element" -> (a => call("element_at", a)),
    "array_to_string" -> (a => call("array_join", a)),
    "list_aggregate" -> { case Seq(l, Literal(fn, _)) =>
      fn.toString match {
        case "sum" => ArrayAggregate(l, Literal(0),
          lam(vs => Add(vs(0), vs(1)), 2),
          lam(vs => vs(0), 1))
        case "min" => call("array_min", Seq(l))
        case "max" => call("array_max", Seq(l))
        case "count" => call("size", Seq(l))
        case other => throw new IllegalArgumentException(
          s"list_aggregate: unsupported '$other'")
      }
    },
    "list_min" -> (a => call("array_min", a)),
    "list_max" -> (a => call("array_max", a)),
    // native codegen'd vector math (graft.engine.expressions.VectorMath)
    "list_cosine_similarity" -> { case Seq(x, y) =>
      graft.engine.expressions.CosineSimilarity(x, y)
    },
    "list_dot_product" -> { case Seq(x, y) =>
      graft.engine.expressions.DotProduct(x, y)
    },
    "list_inner_product" -> { case Seq(x, y) =>
      graft.engine.expressions.DotProduct(x, y)
    },

    // ---- string family ----
    "string_split" -> (a => call("split", a)),
    "str_split" -> (a => call("split", a)),
    "string_to_array" -> (a => call("split", a)),
    "string_split_regex" -> (a => call("split", a)),
    "str_split_regex" -> (a => call("split", a)),
    "regexp_matches" -> { case Seq(s, re) => RLike(s, re) },
    "regexp_full_match" -> { case Seq(s, re) =>
      RLike(s, call("concat", Seq(Literal("^(?:"), re, Literal(")$"))))
    },
    "mismatches" -> (a => hammingExpr(a)),
    "hamming" -> (a => hammingExpr(a)),
    "jaccard" -> { case Seq(x, y) =>
      // DuckDB: char-set jaccard
      def cs(e: Expression) = call("array_distinct",
        Seq(call("split", Seq(e, Literal("")))))
      Divide(
        Cast(call("size", Seq(call("array_intersect", Seq(cs(x), cs(y))))),
          org.apache.spark.sql.types.DoubleType),
        Cast(call("size", Seq(call("array_union", Seq(cs(x), cs(y))))),
          org.apache.spark.sql.types.DoubleType))
    },
    "editdist3" -> (a => call("levenshtein", a)),
    "jaro_similarity" -> { case Seq(x, y) =>
      graft.engine.expressions.JaroSimilarity(x, y)
    },
    "jaro_winkler_similarity" -> { case Seq(x, y) =>
      graft.engine.expressions.JaroWinklerSimilarity(x, y)
    },
    "sha256" -> { case Seq(e) => call("sha2", Seq(e, Literal(256))) },
    "to_base64" -> (a => call("base64", a)),
    "from_base64" -> (a => call("unbase64", a)),
    "encode" -> { case Seq(e) =>
      Cast(e, org.apache.spark.sql.types.BinaryType) },
    "prefix" -> { case Seq(s, p) => call("startswith", Seq(s, p)) },
    "suffix" -> { case Seq(s, p) => call("endswith", Seq(s, p)) },
    "strip_accents" -> { case Seq(e) =>
      // minimal latin fold (full ICU out of scope)
      call("translate", Seq(e, Literal("áàâäãåéèêëíìîïóòôöõúùûüñçý"),
        Literal("aaaaaaeeeeiiiiooooouuuuncy")))
    },
    "ucase" -> (a => call("upper", a)),
    "lcase" -> (a => call("lower", a)),

    // ---- JSON (DuckDB json extension names) ----
    "json_extract_string" -> { case Seq(j, p) =>
      call("get_json_object", Seq(j, normalizeJsonPath(p)))
    },
    "json_extract" -> { case Seq(j, p) =>
      call("get_json_object", Seq(j, normalizeJsonPath(p)))
    },
    "json_valid" -> { case Seq(j) =>
      IsNotNull(call("try_parse_json", Seq(j)))
    },

    // ---- date/time ----
    "epoch" -> { case Seq(ts) =>
      Divide(Cast(call("unix_micros", Seq(Cast(ts,
        org.apache.spark.sql.types.TimestampType))),
        org.apache.spark.sql.types.DoubleType), Literal(1e6))
    },
    "epoch_ms" -> { case Seq(ts) =>
      call("unix_millis", Seq(Cast(ts, org.apache.spark.sql.types.TimestampType)))
    },
    "epoch_us" -> { case Seq(ts) =>
      call("unix_micros", Seq(Cast(ts, org.apache.spark.sql.types.TimestampType)))
    },
    "strftime" -> { case Seq(ts, Literal(fmt, _)) =>
      call("date_format", Seq(ts, Literal(Dialect.strftimeToJava(fmt.toString))))
    },
    "strptime" -> { case Seq(s, Literal(fmt, _)) =>
      call("to_timestamp_ntz", Seq(s, Literal(Dialect.strftimeToJava(fmt.toString))))
    },
    "isodow" -> { case Seq(d) => Add(call("weekday", Seq(d)), Literal(1)) },
    "week" -> (a => call("weekofyear", a)),
    "yearweek" -> { case Seq(d) =>
      Add(Multiply(call("year", Seq(d)), Literal(100)), call("weekofyear", Seq(d)))
    },
    "time_bucket" -> { case Seq(width, ts) =>
      // DuckDB arg order (width, ts); Spark window() is the engine path —
      // here the scalar form via floor on epoch micros
      call("timestamp_micros", Seq(
        Multiply(
          Cast(call("floor", Seq(Divide(
            Cast(call("unix_micros", Seq(Cast(ts,
              org.apache.spark.sql.types.TimestampType))),
              org.apache.spark.sql.types.DoubleType),
            Cast(intervalMicros(width), org.apache.spark.sql.types.DoubleType)))),
            org.apache.spark.sql.types.LongType),
          intervalMicros(width))))
    },
    "date_diff" -> { case Seq(Literal(part, _), a, b) =>
      call("timestampdiff", Seq(Literal(part), a, b))
    },
    "datediff" -> { case Seq(Literal(part, _), a, b) =>
      call("timestampdiff", Seq(Literal(part), a, b))
    },
    "date_sub_part" -> (a => call("timestampdiff", a)),

    // ---- misc ----
    "list_value" -> (a => call("array", a)),
    "struct_insert" -> (a => call("struct", a)))

  private def hammingExpr(a: Seq[Expression]): Expression = a match {
    case Seq(x, y) =>
      def chars(e: Expression) = call("split", Seq(e, Literal("")))
      call("size", Seq(ArrayFilter(
        ZipWith(chars(x), chars(y),
          lam(vs => Not(EqualTo(vs(0), vs(1))), 2)),
        lam(vs => vs(0), 1))))
    case other => throw new IllegalArgumentException(s"hamming: ${other.length} args")
  }

  /** DuckDB accepts '$.k', '/k', and bare 'k' JSONPaths; Spark needs $. */
  private def normalizeJsonPath(p: Expression): Expression = p match {
    case Literal(s, _) if s != null =>
      val str = s.toString
      val norm =
        if (str.startsWith("$")) str
        else if (str.startsWith("/")) "$." + str.substring(1).replace("/", ".")
        else "$." + str
      Literal(norm)
    case other => other
  }

  /** Micros in a CalendarInterval literal (time_bucket widths). */
  private def intervalMicros(e: Expression): Expression = e match {
    case Literal(iv: org.apache.spark.unsafe.types.CalendarInterval, _) =>
      require(iv.months == 0, "time_bucket: month widths unsupported in shim")
      Literal(iv.days * 86400000000L + iv.microseconds)
    case other => other
  }

  /** Install every shim into the session (idempotent). Skips names the
    * session already resolves (never shadow a Spark builtin).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    shims.foreach { case (name, builder) =>
      val already = org.apache.spark.sql.catalyst.analysis.FunctionRegistry
        .builtin.functionExists(FunctionIdentifier(name))
      if (!already) {
        reg.createOrReplaceTempFunction(name, builder, "internal")
      }
    }
  }
}
