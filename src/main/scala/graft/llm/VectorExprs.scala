package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass vector/signature expressions with whole-stage codegen support.
  *
  * Why custom expressions: the composable built-in forms (32 ×
  * array_min(transform(…)) for MinHash, 3 × aggregate(zip_with(…)) for
  * cosine) re-evaluate their array inputs per lane — measured 50-200 s at
  * sf0.1. Each expression here does its work in a single primitive loop
  * (`compute`), and implements doGenCode so its children (splits, scans)
  * stay inside whole-stage codegen rather than falling back to interpreted
  * evaluation (a CodegenFallback expression re-interprets its whole child
  * subtree per row — measured ~2 ms/row for a transform-built child).
  */
private[llm] object MinHashCore {
  final val Golden = 0x9e3779b97f4a7c15L

  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** MinHash lanes over word n-gram shingles of a token array. Each shingle
    * hash is a mix-chain of per-token xxh64s (no string materialization);
    * MIN is duplicate-idempotent so shingles need no dedup here.
    */
  def signature(tokens: ArrayData, shingleN: Int, numHashes: Int): Array[Long] = {
    val nTok = tokens.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val tokHash = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      tokHash(i) =
        if (tokens.isNullAt(i)) 0L
        else {
          val s = tokens.getUTF8String(i)
          org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      i += 1
    }
    val nShingles = math.max(nTok - shingleN + 1, 1)
    i = 0
    while (i < nShingles) {
      var base = 0x2545f4914f6cdd1dL
      var k = 0
      while (k < shingleN && i + k < nTok) {
        base = java.lang.Long.rotateLeft(base ^ (tokHash(i + k) * Golden), 27) * 5 + 0x52dce729L
        k += 1
      }
      var j = 0
      while (j < numHashes) {
        val h = fmix64(base ^ (j * Golden))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    mins
  }
}

/** MinHash signature (array<long> of `numHashes` lanes) over the word
  * `shingleN`-gram shingles of a token array.
  */
case class MinHashSig(child: Expression, shingleN: Int, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  def compute(tokens: ArrayData): ArrayData =
    new GenericArrayData(MinHashCore.signature(tokens, shingleN, numHashes))

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** LSH band buckets: the MinHash lanes are computed as in MinHashSig, then
  * each band of `numHashes/bands` consecutive lanes is hash-combined into
  * one bucket value — all in the same single pass.
  */
case class MinHashBands(child: Expression, shingleN: Int, numHashes: Int, bands: Int)
    extends UnaryExpression {

  require(numHashes % bands == 0, "bands must divide numHashes")
  private val rows = numHashes / bands

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  def compute(tokens: ArrayData): ArrayData = {
    val mins = MinHashCore.signature(tokens, shingleN, numHashes)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b * MinHashCore.Golden
      var r = 0
      while (r < rows) {
        h = java.lang.Long.rotateLeft(h ^ (mins(b * rows + r) * MinHashCore.Golden), 27) * 5 + 0x52dce729L
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("minhashBands", this, classOf[MinHashBands].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** Distinct word n-gram shingles of a token array, joined with single
  * spaces — string-identical to the SQL form
  * `toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]` over distinct i.
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  def compute(toks: ArrayData): ArrayData = {
    val nTok = toks.numElements()
    val out = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val nShingles = math.max(nTok - n + 1, 1)
    var i = 0
    while (i < nShingles) {
      val parts = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String](n)
      var k = 0
      while (k < n && i + k < nTok) {
        if (!toks.isNullAt(i + k)) parts.add(toks.getUTF8String(i + k))
        k += 1
      }
      out.add(org.apache.spark.unsafe.types.UTF8String.concatWs(
        sep, parts.toArray(new Array[org.apache.spark.unsafe.types.UTF8String](parts.size)): _*))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("shingles", this, classOf[Shingles].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** Cosine similarity of two numeric arrays in one pass, accumulating in
  * double with the same left-to-right order as the composable
  * aggregate(zip_with(...)) form — results are bit-identical to it (and to
  * the DuckDB oracle's list_cosine_similarity over DOUBLE[]).
  *
  * Degenerate inputs are defined, not undefined: a null element counts as
  * 0.0 (it contributes nothing to dot or norm), and a zero-norm side yields
  * 0.0 rather than 0/0 = NaN — NaN would poison downstream top-k ordering.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  @transient private lazy val elemX = left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val elemY = right.dataType.asInstanceOf[ArrayType].elementType

  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (a.isNullAt(i)) 0.0 else num(a, i, elemX)
      val yi = if (b.isNullAt(i)) 0.0 else num(b, i, elemY)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("cosineSim", this, classOf[CosineSim].getName)
      s"${ev.value} = $ref.compute($a, $b);"
    })

  private def num(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case LongType => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case _ => throw new IllegalArgumentException(s"unsupported element type $t")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  import org.apache.spark.sql.graft.ColumnBridge

  /** MinHash signature over word n-gram shingles of `tokens`. */
  def minhashSig(tokens: Column, shingleN: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(tokens), shingleN, numHashes))

  /** LSH band buckets over word n-gram shingles of `tokens`. */
  def minhashBands(tokens: Column, shingleN: Int, numHashes: Int, bands: Int): Column =
    ColumnBridge.column(MinHashBands(ColumnBridge.expression(tokens), shingleN, numHashes, bands))

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Distinct word n-gram shingle strings of a token array. */
  def shingleArray(tokens: Column, n: Int): Column =
    ColumnBridge.column(Shingles(ColumnBridge.expression(tokens), n))
}
