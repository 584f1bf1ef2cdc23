package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ASOF join — SURVEY.md §2.3 J7. DuckDB ships a dedicated ASOF physical
  * operator; Spark has no native one. This is the union+window rewrite
  * from SURVEY §7.4 item 2:
  *
  *   1. tag right rows side=0, left rows side=1;
  *   2. union by name; sort within each key partition by (ts, side) so a
  *      right row at the same timestamp precedes the left row (inclusive
  *      `left.ts >= right.ts` semantics);
  *   3. `last(payload, ignoreNulls)` over an unbounded-preceding ROWS
  *      frame carries the latest right payload forward onto left rows;
  *   4. keep left rows.
  *
  * The right payload travels as ONE struct so all carried columns come
  * from the same matched row (per-column last() could mix rows if any
  * payload value were null).
  *
  * Scale: a single hash shuffle on the key + one in-partition sort — the
  * same cost class as a sort-merge join; no broadcast, no driver-side
  * binary search, and AQE skew-split applies. Works for any key
  * cardinality at 100 TB.
  */
object AsOfJoin {

  /** Left ASOF join: every `left` row, plus `payload` columns
    * (srcCol -> outAlias) from the latest `right` row with the same `key`
    * and `right.ts <= left.ts` (nulls when no such row).
    */
  def asofLeft(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[(String, String)]): DataFrame = {
    val pStruct = struct(payload.map { case (src, al) => col(src).as(al) }: _*)
    // NULL join keys never match in ASOF (SQL equality semantics), but
    // Window.partitionBy groups NULLs together — drop NULL-keyed right
    // rows so NULL-keyed left rows get a NULL payload, not each other's.
    // NULL-ts right rows likewise never match (l.ts >= NULL is never
    // true), but nulls-first ordering would slot them before every row in
    // the partition and last(__p) would carry their payload — drop them.
    // (A NULL-ts LEFT row sorts before all surviving right rows and so
    // correctly gets a NULL payload.)
    val r = right.filter(col(key).isNotNull && col(ts).isNotNull)
      .select(col(key), col(ts), pStruct.as("__p"), lit(0).as("__side"))
    val l = left.withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        payload.map { case (_, al) => col("__match").getField(al).as(al) }: _*)
  }
}
