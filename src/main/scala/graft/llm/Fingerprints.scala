package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for document fingerprinting (SURVEY.md §7.5).
  *
  * Deterministic scalar expressions with doGenCode (children stay inside
  * whole-stage codegen; the per-row work is one primitive loop).
  */

/** Arithmetic mod 2^61-1 (Mersenne): the SQL-reproducible hash field
  * shared by the winnowing fingerprint and SimHash's poly token hasher —
  * every intermediate fits HUGEINT on the DuckDB side, so oracles replay
  * it exactly (proven by the llm_fingerprint oracle).
  */
private[graft] object Mod61 {
  final val Base = 257L
  final val Mod = (1L << 61) - 1

  def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold the 128-bit product mod 2^61-1
    val r = (lo & Mod) + ((lo >>> 61) | (hi << 3))
    if (r >= Mod) r - Mod else r
  }
  def addMod(a: Long, b: Long): Long = { val r = a + b; if (r >= Mod) r - Mod else r }
  def subMod(a: Long, b: Long): Long = { val r = a - b; if (r < 0) r + Mod else r }

  /** Base-257 polynomial over a byte range: h = ((h*257)+b) mod 2^61-1. */
  def polyHash(base: Object, offset: Long, len: Int): Long = {
    var h = 0L
    var j = 0
    while (j < len) {
      h = addMod(mulMod(h, Base),
        (org.apache.spark.unsafe.Platform.getByte(base, offset + j) & 0xff).toLong)
      j += 1
    }
    h
  }

  /** Field bit-mixer: three rounds of h ← h² + Cᵢ. The raw polynomial of
    * a short token is small, so its high bits are all zero — fatal for
    * simhash bit votes; squaring spreads that mass across the field
    * (measured: simhash pair statistics become indistinguishable from a
    * uniform token hash), and each round stays one HUGEINT-replicable
    * multiply-add for the SQL oracle. Cᵢ = golden-ratio/xxh64 prime
    * constants folded mod 2^61-1.
    */
  def mix(h0: Long): Long = {
    var h = h0
    h = addMod(mulMod(h, h), 2177342782468422681L) // 0x9E3779B97F4A7C15 mod M
    h = addMod(mulMod(h, h), 194409311614856021L)  // 0xC2B2AE3D27D4EB4F mod M
    h = addMod(mulMod(h, h), 1609587929392839161L) // 0x165667B19E3779F9 mod M
    h
  }
}

/** Winnowing fingerprint (Karp-Rabin rolling hash, window `w`, then the
  * minimum window hash): robust to local edits, constant output size.
  * Standard winnowing scheme per Schleimer/Wilkerson/Aiken (SIGMOD'03).
  */
case class RollingFingerprint(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  import Mod61.{Base, addMod, mulMod, subMod}

  def compute(input: UTF8String): Long = {
    val bytes = input.getBytes
    if (bytes.length == 0) return 0L
    if (bytes.length <= w) return fullHash(bytes)
    var pow = 1L
    var i = 1
    while (i < w) { pow = mulMod(pow, Base); i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = addMod(mulMod(h, Base), bytes(i) & 0xffL); i += 1 }
    var minH = h
    while (i < bytes.length) {
      h = subMod(h, mulMod(bytes(i - w) & 0xffL, pow))
      h = addMod(mulMod(h, Base), bytes(i) & 0xffL)
      if (h < minH) minH = h
      i += 1
    }
    minH
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("rollingFp", this, classOf[RollingFingerprint].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  private def fullHash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = addMod(mulMod(h, Base), bytes(i) & 0xffL); i += 1 }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

/** ROBUST winnowing selection (Schleimer/Wilkerson/Aiken SIGMOD'03, the
  * MOSS algorithm) — where `RollingFingerprint` keeps one global-min
  * hash per document, this keeps the full winnowed SET: the rightmost
  * minimal k-gram hash of every w-window of consecutive gram hashes,
  * deduplicated. Guarantees: any shared substring of at least w+k-1
  * bytes yields at least one shared selected fingerprint, and the
  * selected density is ~2/(w+1) of all grams — the property that makes a
  * partial-overlap inverted index BOUNDED (indexing every gram is a ~k×
  * larger index for the same detection floor). Output is an array of
  * packed longs `pos·2³² + fp32` (fp32 = mixed gram hash mod 2³²; pos =
  * 0-based gram start), so the set explodes into (pos, fp) rows without
  * struct codegen. Hashing is the same Mod61 polynomial + squaring mixer
  * the simhash/fingerprint oracles already replay in HUGEINT SQL.
  *
  * Texts shorter than k bytes select nothing; with fewer than w grams
  * the window shrinks to the gram count (short docs still fingerprint).
  * Rightmost-min selections of consecutive windows form contiguous runs
  * per position, so consecutive-dedup equals per-position distinct —
  * the property the SQL oracle's DISTINCT relies on.
  */
case class WinnowSet(child: Expression, k: Int, w: Int) extends UnaryExpression {

  require(k >= 2 && k <= 64, "gram size k in [2,64]")
  require(w >= 2 && w <= 64, "window w in [2,64]")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_set"

  import Mod61.{Base, addMod, mulMod, subMod}

  def compute(input: UTF8String): ArrayData = {
    val bytes = input.getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return ArrayData.toArrayData(Array.empty[Long])
    val fp = new Array[Long](n)
    var pow = 1L
    var i = 1
    while (i < k) { pow = mulMod(pow, Base); i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = addMod(mulMod(h, Base), bytes(i) & 0xffL); i += 1 }
    fp(0) = Mod61.mix(h) % 4294967296L
    i = k
    while (i < bytes.length) {
      h = subMod(h, mulMod(bytes(i - k) & 0xffL, pow))
      h = addMod(mulMod(h, Base), bytes(i) & 0xffL)
      fp(i - k + 1) = Mod61.mix(h) % 4294967296L
      i += 1
    }
    val ws = math.min(w, n)
    val out = new scala.collection.mutable.ArrayBuffer[Long](2 * n / (ws + 1) + 2)
    var last = -1
    var s = 0
    while (s + ws <= n) {
      // descending scan with strict < keeps the RIGHTMOST minimum on ties
      var best = Long.MaxValue
      var bestPos = -1
      var j = s + ws - 1
      while (j >= s) { if (fp(j) < best) { best = fp(j); bestPos = j }; j -= 1 }
      if (bestPos != last) { out += bestPos.toLong * 4294967296L + best; last = bestPos }
      s += 1
    }
    ArrayData.toArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("winnowSet", this, classOf[WinnowSet].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowSet =
    copy(child = newChild)
}

/** 64-bit SimHash over an array of tokens: per bit, sum ±1 across token
  * hashes and keep the sign. Near-duplicate docs differ in few bits
  * (compare with hamming distance = bit_count(a ^ b)). Accepts either an
  * array<string> — tokens hashed internally, keeping the child subtree
  * trivial — or a precomputed array<long>.
  *
  * String token hashers: xxh64 (default; fastest) or `poly = true` for
  * the base-257 mod-2^61-1 polynomial — ~4 ns/byte vs sha-class hashes,
  * and exactly reproducible in ANSI SQL (DuckDB `list_reduce` in HUGEINT;
  * see the llm_dedup_simhash oracle), which is what makes the whole
  * simhash pipeline oracle-checkable. Poly hashes span bits 0..60.
  */
case class SimHash64(child: Expression, poly: Boolean = false) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  // lazy: child.dataType is only resolvable after analysis
  @transient private lazy val elementIsString =
    child.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == org.apache.spark.sql.types.StringType

  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h =
          if (!elementIsString) arr.getLong(i)
          else {
            val s = arr.getUTF8String(i)
            if (poly) Mod61.mix(Mod61.polyHash(s.getBaseObject, s.getBaseOffset, s.numBytes))
            else org.apache.spark.sql.catalyst.expressions.XXH64
              .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
          }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Duplicate-token fraction 1 - distinct/total in ONE pass — semantics
  * identical to `1 - size(array_distinct(split(s, "\\s+"))) / size(split
  * (s, "\\s+"))` (leading-empty-token and empty-input cases included),
  * but with no token-array materialization per evaluation. Matters in the
  * curation pipeline, whose filter subtree is deliberately recomputed per
  * branch (see Curation.annotate): the composable form re-splits the text
  * at every branch evaluation.
  */
case class DupTokenFrac(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "dup_token_frac"

  private def isSpace(b: Byte): Boolean = // java regex \s
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def compute(input: UTF8String): Double = {
    // replicates Pattern.split(s, -1) on \s+ (Spark's split): segments
    // between maximal whitespace runs, keeping boundary empties
    val bytes = input.getBytes
    val seen = new java.util.HashSet[UTF8String]()
    var total = 0
    var i = 0
    var done = false
    while (!done) {
      val start = i
      while (i < bytes.length && !isSpace(bytes(i))) i += 1
      seen.add(UTF8String.fromBytes(bytes, start, i - start))
      total += 1
      if (i == bytes.length) done = true
      else while (i < bytes.length && isSpace(bytes(i))) i += 1
    }
    1.0 - seen.size.toDouble / total
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("dupFrac", this, classOf[DupTokenFrac].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): DupTokenFrac =
    copy(child = newChild)
}

object Fingerprints {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API for the winnowing fingerprint. */
  def rollingFingerprint(c: Column, window: Int = 16): Column =
    ColumnBridge.column(RollingFingerprint(ColumnBridge.expression(c), window))

  /** Column API for the robust winnowed fingerprint SET (packed
    * pos·2³²+fp32 longs).
    */
  def winnowSet(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowSet(ColumnBridge.expression(text), k, w))

  /** Column API for simhash over an array of tokens (or token hashes). */
  def simhash64(tokens: Column, poly: Boolean = false): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens), poly))

  /** Column API for the one-pass duplicate-token fraction. */
  def dupTokenFrac(text: Column): Column =
    ColumnBridge.column(DupTokenFrac(ColumnBridge.expression(text)))
}
