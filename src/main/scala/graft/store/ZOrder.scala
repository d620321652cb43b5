package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import graft.Tables

/** Z-order (Morton) clustering: multi-column data skipping on a
  * one-dimensional layout.
  *
  * Sorting a table by one column makes that column's per-file [min,max]
  * ranges narrow — and every OTHER column's ranges as wide as the table
  * (the manifest prunes nothing for them). Interleaving the bits of two
  * columns into one z-value and range-writing by it bounds BOTH columns
  * per file (a z-ordered file is an axis-aligned box in (a, b) space up
  * to boundary effects), so a 2-D box predicate touches O(perimeter)
  * files instead of everything — the layout Delta's OPTIMIZE ZORDER BY
  * applies before the same min/max skipping `Lake.writeManifest`
  * provides. One extra column, one range write: no new read path, plain
  * parquet readers see an ordinary table.
  *
  * The z-value is exact integer arithmetic (bit interleave), so it is
  * SQL-replayable and the exported keys are oracle-checkable.
  */
object ZOrder {

  /** Morton code of two non-negative int columns, `bits` bits each
    * (z < 2^(2·bits); 21+21 → 42 bits, safely BIGINT). Nulls and
    * negatives clamp to 0 — layout code must not throw on dirty rows
    * (they cluster together at the origin instead).
    */
  def zvalue(a: Column, b: Column, bits: Int): Column =
    ZOrderExprs.zvalue(a, b, bits)

  /** Rewrite `df` range-partitioned by z(a, b) into `nFiles` files and
    * build the min/max manifest over both columns — after this,
    * `Lake.readSkippingRanges` prunes on a AND b.
    */
  def writeZOrdered(df: DataFrame, dest: String, colA: String, colB: String,
                    bits: Int, nFiles: Int): Unit = {
    df.withColumn("_z", zvalue(col(colA), col(colB), bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(dest)
    Lake.writeManifest(df.sparkSession, dest, Seq(colA, colB))
  }

  // ---- registered query ---------------------------------------------------

  private val Bits = 21

  /** The z-key table for lineitem's (partkey, suppkey) — the clustering
    * key an OPTIMIZE ZORDER would sort by; oracle-green proves the
    * interleave bit-for-bit.
    */
  def zKeysQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        zvalue(col("l_partkey"), col("l_suppkey"), Bits).as("z"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_keys" -> (zKeysQuery _))

  val oracles: Map[String, String] = Map(
    // the same interleave as a list_sum over bit positions: exact
    // integers, every term < 2^63
    "zorder_keys" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  CAST(list_sum(list_transform(range($Bits), k ->
         |    ((greatest(CAST(l_partkey AS BIGINT), 0) >> k) & 1) * (1::BIGINT << (2*k))
         |    + ((greatest(CAST(l_suppkey AS BIGINT), 0) >> k) & 1) * (1::BIGINT << (2*k + 1))
         |  )) AS BIGINT) AS z
         |FROM lineitem
         |ORDER BY l_orderkey, l_linenumber""".stripMargin)
}

/** Bit-interleave kernel: z = Σ_k a_k·2^(2k) + b_k·2^(2k+1). */
case class ZValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, "bits in [1,31]")

  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue"

  def compute(a: Long, b: Long): Long = {
    val x = math.max(a, 0L)
    val y = math.max(b, 0L)
    var z = 0L
    var k = 0
    while (k < bits) {
      z |= ((x >> k) & 1L) << (2 * k)
      z |= ((y >> k) & 1L) << (2 * k + 1)
      k += 1
    }
    z
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("zvalue", this, classOf[ZValue].getName)
      s"${ev.value} = $ref.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}

private[store] object ZOrderExprs {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Null → 0 is applied HERE (coalesce), so the kernel itself is a
    * plain null-safe long→long expression.
    */
  def zvalue(a: Column, b: Column, bits: Int): Column =
    ColumnBridge.column(ZValue(
      ColumnBridge.expression(coalesce(a.cast("long"), lit(0L))),
      ColumnBridge.expression(coalesce(b.cast("long"), lit(0L))), bits))
}
