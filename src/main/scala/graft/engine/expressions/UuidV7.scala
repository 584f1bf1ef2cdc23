package graft.engine.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9562 UUID version 7 (DuckDB 1.3's `uuidv7()`): 48-bit
  * big-endian Unix milliseconds, then `0b0111` version and 12 random
  * bits, then the `0b10` variant and 62 random bits. The millisecond
  * prefix makes values time-ordered across the cluster (the property
  * v7 exists for); sub-millisecond calls are randomly ordered, same as
  * DuckDB (which fills rand_a randomly rather than with a counter).
  *
  * Nondeterministic leaf (one RNG per partition, seeded from both the
  * partition index and entropy) — the optimizer can never collapse two
  * calls or constant-fold one, exactly like Spark's own `uuid()`.
  * CodegenFallback: id generation is never a hot inner loop here.
  */
case class UuidV7() extends LeafExpression
    with Nondeterministic with CodegenFallback {
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "uuidv7"

  @transient private var rng: java.util.Random = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    // default SecureRandom (urandom-backed, never blocks) just for the
    // seed; the per-row stream is a plain PRNG like Spark's uuid()
    rng = new java.util.Random(
      new java.security.SecureRandom().nextLong() ^ partitionIndex.toLong)

  override protected def evalInternal(input: InternalRow): Any = {
    val ms = System.currentTimeMillis()
    val randA = rng.nextInt(1 << 12)
    val hi = (ms << 16) | 0x7000L | randA.toLong
    val lo = (rng.nextLong() & 0x3fffffffffffffffL) | 0x8000000000000000L
    UTF8String.fromString(new java.util.UUID(hi, lo).toString)
  }
}

/** `uuid_extract_timestamp` / `uuid_extract_version` kernels
  * (StaticInvoke shims): the millisecond prefix of a v7 (or the
  * Gregorian 100ns counter of a v1) as epoch MICROseconds, and the
  * version nibble. Unsupported versions raise, like DuckDB.
  */
object UuidKernels {
  private def parse(s: UTF8String): java.util.UUID =
    try java.util.UUID.fromString(s.toString)
    catch {
      case _: Exception => throw new IllegalArgumentException(
        s"invalid UUID: $s")
    }

  def extractVersion(s: UTF8String): Int = parse(s).version()

  /** Epoch microseconds of the UUID's embedded timestamp. v7: top 48
    * bits are Unix ms. v1: 60-bit count of 100ns intervals since
    * 1582-10-15 (the Gregorian reformation), split low/mid/high.
    */
  def extractTimestampMicros(s: UTF8String): Long = {
    val u = parse(s)
    u.version() match {
      case 7 =>
        (u.getMostSignificantBits >>> 16) * 1000L
      case 1 =>
        // java.util.UUID.timestamp() reassembles the 60-bit v1 counter
        val gregorian100ns = u.timestamp()
        // 1582-10-15T00:00:00Z to 1970-01-01T00:00:00Z in 100ns units
        val epochOffset100ns = 122192928000000000L
        (gregorian100ns - epochOffset100ns) / 10L
      case v => throw new IllegalArgumentException(
        s"uuid_extract_timestamp: unsupported UUID version $v (v1/v7 carry a timestamp)")
    }
  }
}
