package graft.engine

import org.apache.spark.sql.types._

/** Executable output-edge type contract for every declared query
  * (SURVEY §5.2; VERDICT r9 "What's wrong" item 3).
  *
  * The driver's comparator materializes DuckDB results via pandas and
  * Spark results via parquet→pyarrow, then hashes (dtype-kind, value)
  * per cell. Some types are VALUE-identical across engines but
  * KIND-different in that materialization, so they can never appear at
  * the output edge of an oracle-checked query:
  *
  *  - DecimalType: DuckDB DECIMAL → float64, Spark decimal128 →
  *    Python Decimal objects. Two rounds shipped red rows on this
  *    (r8 f_math.bigfact, r9 q8_market_share) with every value equal.
  *    Route exact arithmetic through DECIMAL *internally*, then cast
  *    the final column to DOUBLE (ratios/sums) or VARCHAR (HUGEINT-
  *    domain exact digits).
  *  - CalendarIntervalType / YearMonth/DayTimeIntervalType: no stable
  *    cross-engine parquet materialization; emit the count in a unit
  *    (BIGINT seconds/days) instead.
  *  - TimestampType (instant, isAdjustedToUTC=true in parquet): pandas
  *    reads tz-aware datetime64[ns, UTC] where the DuckDB side is
  *    naive datetime64[ns] — kind mismatch. Fixture timestamps are
  *    NTZ; emit TimestampNTZType (the default under this repo's
  *    readers) or DATE.
  *
  * Checked recursively: a DECIMAL inside a struct/array/map fails the
  * same way once the comparator descends into Python objects.
  */
object OutputContract {

  /** Human-readable violations for a declared query's output schema;
    * empty = contract satisfied. */
  def violations(schema: StructType): Seq[String] =
    schema.fields.toSeq.flatMap(f => check(f.name, f.dataType))

  private def check(path: String, dt: DataType): Seq[String] = dt match {
    case d: DecimalType =>
      Seq(s"$path: ${d.simpleString} — DECIMAL at the output edge; cast the final column to DOUBLE or VARCHAR (driver comparator kind-mismatch, VERDICT r8/r9)")
    case CalendarIntervalType =>
      Seq(s"$path: interval — emit a BIGINT count in a fixed unit instead")
    case _: YearMonthIntervalType | _: DayTimeIntervalType =>
      Seq(s"$path: ${dt.simpleString} — emit a BIGINT count in a fixed unit instead")
    case TimestampType =>
      Seq(s"$path: timestamp (instant) — fixture timestamps are NTZ; emit timestamp_ntz or date (pandas tz-aware vs naive kind-mismatch)")
    case s: StructType =>
      s.fields.toSeq.flatMap(f => check(s"$path.${f.name}", f.dataType))
    case a: ArrayType  => check(s"$path[]", a.elementType)
    case m: MapType =>
      check(s"$path{key}", m.keyType) ++ check(s"$path{value}", m.valueType)
    case _ => Nil
  }

  /** Throw (loudly, listing every offending column) if the schema
    * violates the contract — called by Verify before each dump so a
    * violating query shows red at the driver without poisoning the
    * whole run, and by OutputContractSpec so the build fails first. */
  def enforce(queryName: String, schema: StructType): Unit = {
    val v = violations(schema)
    if (v.nonEmpty)
      throw new IllegalStateException(
        s"output-type contract violation in '$queryName': ${v.mkString("; ")}")
  }
}
