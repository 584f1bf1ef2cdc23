package graft.engine.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature over whitespace 3-gram shingles — the hot
  * loop of web-scale near-dup detection (SURVEY.md §7.5; reference
  * reaches dedup via arbitrary SQL, /root/reference/main.go:229).
  *
  * Computes, natively, exactly what the declarative pipeline
  * `split → 3-gram shingle ('' padded tail) → md5 hex → per-shingle
  * 4-hex-char slices → per-slice minimum` computes — so the DuckDB
  * oracle SQL is unchanged — but in one loop with zero intermediate
  * arrays. The declarative form pays interpreted higher-order-function
  * evaluation per element plus three materialized arrays per row; this
  * is the promote-hot-paths-to-Expression tier of §2.11.
  *
  * k slices of one md5 ≈ k independent hash functions at 1/k the digest
  * cost (md5 bits are independent); k ≤ 8 (32 hex chars / 4).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 8, s"MinHashSig: k must be in [1,8], got $k")

  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    MinHashSig.compute(v.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.engine.expressions.MinHashSig.compute($v, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  private val HEX = "0123456789abcdef".toCharArray

  /** Shared shingle walk: the ''-padded 3-gram construction used by
    * BOTH the signature and verification kernels — one definition, so
    * they can never desynchronize. split(" ", -1): Spark's split keeps
    * trailing empty tokens (Java's default split(regex) drops them — a
    * silent divergence trap).
    */
  private[expressions] def forEachShingle(text: UTF8String)(f: String => Unit): Unit = {
    val toks = text.toString.split(" ", -1)
    val m = math.max(toks.length - 2, 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      // 3-gram with ''-padded tail: "t1 t2 t3", "t1 t2 ", "t1  "
      sb.setLength(0)
      sb.append(toks(i)).append(' ')
      if (i + 1 < toks.length) sb.append(toks(i + 1))
      sb.append(' ')
      if (i + 2 < toks.length) sb.append(toks(i + 2))
      f(sb.toString)
      i += 1
    }
  }

  /** The signature kernel; also the static target of the generated code
    * (same pattern as Spark's levenshtein). ≥1 shingle always exists
    * (the padded window), so every slot is populated.
    */
  def compute(text: UTF8String, k: Int): GenericArrayData = {
    val mins = new Array[String](k)
    val md = MessageDigest.getInstance("MD5")
    forEachShingle(text) { shingle =>
      md.reset()
      val digest = md.digest(shingle.getBytes(StandardCharsets.UTF_8))
      // per-slice minima over the lowercase hex of the digest
      var j = 0
      while (j < k) {
        val slice = hexSlice(digest, j)
        if (mins(j) == null || slice.compareTo(mins(j)) < 0) mins(j) = slice
        j += 1
      }
    }
    new GenericArrayData(mins.map(UTF8String.fromString))
  }

  /** Hex chars [4j, 4j+4) of the digest = bytes 2j and 2j+1. */
  private def hexSlice(digest: Array[Byte], j: Int): String = {
    val b0 = digest(2 * j) & 0xff
    val b1 = digest(2 * j + 1) & 0xff
    new String(Array(HEX(b0 >> 4), HEX(b0 & 0xf), HEX(b1 >> 4), HEX(b1 & 0xf)))
  }
}

/** Distinct ''-padded whitespace 3-gram shingles, natively — the
  * verification-side companion of [[MinHashSig]] (candidate pairs are
  * re-checked with exact shingle-set jaccard). Produces exactly what
  * `array_distinct(zip_with(zip_with(slice...)...))` produces, in
  * first-occurrence order, without interpreted per-element lambdas.
  */
case class Shingles3(child: Expression) extends UnaryExpression {
  override def prettyName: String = "shingles3"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles3 requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    Shingles3.compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.engine.expressions.Shingles3.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles3 {
  def compute(text: UTF8String): GenericArrayData = {
    val seen = new java.util.LinkedHashSet[String]()
    MinHashSig.forEachShingle(text)(seen.add(_))
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
