package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels for the text-hashing and vector primitives: one tight loop
  * per row, shared by interpreted eval and generated code (the codegen path
  * emits a single static call, so the expressions stay inside whole-stage
  * codegen instead of falling back to row-at-a-time eval). */
object HashKernels {
  val P: Long = 1000000007L

  def tokenHashes(input: UTF8String): ArrayData = {
    val bytes = input.getBytes
    var n = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') n += 1; i += 1 }
    val out = new Array[Long](n)
    var acc = 0L
    var j = 0
    i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b == ' ') { out(j) = acc; j += 1; acc = 0L }
      else acc = (acc * 31L + b) % P
      i += 1
    }
    out(j) = acc
    new GenericArrayData(out)
  }

  def shingleHashes(ths: ArrayData, n: Int): ArrayData = {
    val cnt = ths.numElements()
    val m = math.max(0, cnt - n + 1)
    val arr = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = ths.getLong(i)
      var k = 1
      while (k < n) { acc = (acc * 31L + ths.getLong(i + k)) % P; k += 1 }
      arr(i) = acc
      i += 1
    }
    new GenericArrayData(arr)
  }

  /** Non-overlapping chunk hashes: the polynomial fold of every n-wide chunk
    * of the hash sequence anchored at offsets 0, n, 2n, … (trailing partial
    * chunk kept) — ceil(len/n) outputs. Fold starts at 0, so a chunk's hash
    * equals DuckDB's seedless list_reduce over the same slice. */
  def chunkHashes(ths: ArrayData, n: Int): ArrayData = {
    val cnt = ths.numElements()
    val m = (cnt + n - 1) / n
    val out = new Array[Long](m)
    var c = 0
    var i = 0
    while (c < m) {
      var acc = 0L
      val end = math.min(i + n, cnt)
      while (i < end) { acc = (acc * 31L + ths.getLong(i)) % P; i += 1 }
      out(c) = acc
      c += 1
    }
    new GenericArrayData(out)
  }

  def minhashSig(sh: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val k = as.length
    val mins = Array.fill(k)(P)
    val cnt = sh.numElements()
    var i = 0
    while (i < cnt) {
      val s = sh.getLong(i)
      var j = 0
      while (j < k) {
        val h = (as(j) * s + bs(j)) % P
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def simhash(ths: ArrayData, bits: Int): Long = {
    val votes = new Array[Long](bits)
    val cnt = ths.numElements()
    var i = 0
    while (i < cnt) {
      val h = ths.getLong(i)
      var j = 0
      while (j < bits) { votes(j) += ((h >> j) & 1L) * 2L - 1L; j += 1 }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  def polyFold(a: ArrayData): Long = {
    var acc = 0L
    var i = 0
    val cnt = a.numElements()
    while (i < cnt) { acc = (acc * 31L + a.getLong(i)) % P; i += 1 }
    acc
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.numElements(), b.numElements())
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Count–Min row-hash constants — THE single definition; the sketch
    * aggregator ([[graft.operators.FreqSketch.CMAgg]]) and the codegen'd
    * point-estimate expression below both hash through here, so the builder
    * and the prober can never drift. Odd multiply-shift constants: the
    * sketch needs only pairwise independence, and FIXED constants keep
    * estimates deterministic across runs, retries, and scale factors. */
  val CmA: Array[Long] = Array(0x9E3779B97F4A7C15L, 0xC2B2AE3D27D4EB4FL,
                               0x165667B19E3779F9L, 0x27D4EB2F165667C5L)

  /** Flattened cell index for row `row` of a d×w Count–Min matrix. Raw JVM
    * long arithmetic (wrapping multiply, unsigned shift) — identical under
    * interpreted eval, codegen, and the driver-side aggregator, and immune
    * to the SQL ANSI-overflow setting. */
  def cmCell(row: Int, w: Int, x: Long): Int = {
    val h = (CmA(row) * x) >>> 33 // multiply-shift: high bits mix best
    row * w + (h % w).toInt
  }

  /** Count–Min point estimate: min over the d row cells for item `x`. */
  def cmEstimate(cells: Array[Long], w: Int, d: Int, x: Long): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < d) { val v = cells(cmCell(i, w, x)); if (v < best) best = v; i += 1 }
    best
  }

  /** Distinct sliding-window minima (winnowing): the min of every w-wide
    * window over the hash sequence, first-occurrence deduped. Monotonic
    * deque — O(n) total, vs O(n·w) for the per-window array_min scan. */
  def winnowMins(sh: ArrayData, w: Int): ArrayData = {
    val n = sh.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val deque = new Array[Int](n)
    var head = 0; var tail = 0
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](n - w + 1)
    var m = 0
    var i = 0
    while (i < n) {
      val v = sh.getLong(i)
      while (tail > head && sh.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val win = sh.getLong(deque(head))
        if (seen.add(win)) { out(m) = win; m += 1 }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** Johnson–Lindenstrauss ±1 sign projection of a quantized vector:
    * out[j] = Σᵢ sign(i,j)·qv[i], sign = parity of bit 16 of Knuth's
    * multiplicative hash ((i·outDims+j)·2654435761 mod 2³²) — the exact
    * arithmetic the oracle states. One tight d×k loop per row; the HOF
    * formulation (transform of aggregates with lambdas) is interpreted
    * per element and measured ~60× slower at sf0.1. */
  def jlSignProject(qv: ArrayData, outDims: Int): ArrayData = {
    val d = qv.numElements()
    val out = new Array[Long](outDims)
    var j = 0
    while (j < outDims) {
      var acc = 0L
      var i = 0
      while (i < d) {
        val h = ((i.toLong * outDims + j) * 2654435761L) % 4294967296L
        val sign = if ((h / 65536L) % 2L == 0L) 1L else -1L
        acc += sign * qv.getLong(i)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expressions over [[HashKernels]].
  *
  * Motivation (measured, not guessed): the same kernels composed from
  * built-in higher-order functions (`transform`/`aggregate` with lambdas) are
  * interpreted per element — a bench stack dump showed a single task burning
  * ~1000 s in nested `ArrayTransform.eval` at sf0.1. These expressions do the
  * identical arithmetic in one tight JVM loop per row (same results — the
  * DuckDB oracle SQL is unchanged) and generate a single static call under
  * whole-stage codegen.
  *
  * Semantics note: byte-level (b & 0xff) == DuckDB `ascii(c)` per character
  * for ASCII text, which is the contract of this corpus; it also matches
  * DuckDB's `string_split` trailing-empty behavior (a trailing space yields
  * an empty token with hash 0), unlike Java's `String.split`.
  */
object HashExpressions {
  val P: Long = HashKernels.P

  private val K = "graft.functions.HashKernels"

  /** Polynomial hash of each whitespace-separated token: array<long>. */
  case class TokenHashes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      HashKernels.tokenHashes(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.tokenHashes($c)")
    override protected def withNewChildInternal(c: Expression): TokenHashes = copy(c)
  }

  /** Word n-gram shingle hashes from token hashes: array<long> of length
    * max(0, numTokens - n + 1). */
  case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      HashKernels.shingleHashes(input.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.shingleHashes($c, $n)")
    override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
  }

  /** Non-overlapping n-token chunk hashes (the paragraph-dedup frame):
    * array<long> of length ceil(numTokens / n). One tight loop under
    * whole-stage codegen vs the interpreted transform/aggregate/slice
    * HOF stack doing per-chunk allocations. */
  case class ChunkHashes(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      HashKernels.chunkHashes(input.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.chunkHashes($c, $n)")
    override protected def withNewChildInternal(c: Expression): ChunkHashes = copy(child = c)
  }

  /** All MinHash components in ONE pass over the shingle array:
    * out[j] = min over shingles of (a(j)*s + b(j)) % P, or P if empty. */
  case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long])
      extends UnaryExpression {
    require(as.length == bs.length)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private lazy val aArr = as.toArray
    private lazy val bArr = bs.toArray
    override def nullSafeEval(input: Any): Any =
      HashKernels.minhashSig(input.asInstanceOf[ArrayData], aArr, bArr)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
      defineCodeGen(ctx, ev, c => s"$K.minhashSig($c, $aRef, $bRef)")
    }
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  }

  /** SimHash over token hashes in one pass: bit j of the result is 1 iff the
    * sum over tokens of ((h>>j)&1)*2-1 is positive. */
  case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(HashKernels.simhash(input.asInstanceOf[ArrayData], bits))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.simhash($c, $bits)")
    override protected def withNewChildInternal(c: Expression): SimHash = copy(child = c)
  }

  /** Left-fold polynomial combine of an array<long>: fold (acc*31+x)%P from 0.
    * (With acc0 = 0 the first step yields x0, matching DuckDB list_reduce.) */
  case class PolyFold(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(HashKernels.polyFold(input.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.polyFold($c)")
    override protected def withNewChildInternal(c: Expression): PolyFold = copy(c)
  }

  /** Distinct w-window minima over a shingle-hash array (MOSS winnowing).
    * Same value set as array_distinct(transform(sequence(0, size-w),
    * i -> array_min(slice(sh, i+1, w)))) but one O(n) deque pass in codegen
    * instead of interpreted HOF lambdas doing O(n·w) work. */
  case class WinnowMins(child: Expression, w: Int) extends UnaryExpression {
    require(w >= 1)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      HashKernels.winnowMins(input.asInstanceOf[ArrayData], w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.winnowMins($c, $w)")
    override protected def withNewChildInternal(c: Expression): WinnowMins = copy(child = c)
  }

  /** Count–Min point estimate of one Long item against a FROZEN d×w matrix
    * (a completed [[graft.operators.FreqSketch.CMSketch]]'s cells): the
    * open-vocabulary replacement for a vocabulary-sized exact-counts
    * broadcast — the matrix is constant-size (w·d longs) however many
    * distinct items the corpus holds, rides the expression as a reference
    * object, and the probe is d array reads under whole-stage codegen. */
  case class CmEstimate(child: Expression, cells: Array[Long], w: Int, d: Int)
      extends UnaryExpression {
    require(w >= 2 && d >= 1 && d <= HashKernels.CmA.length &&
      cells.length == w * d, s"bad CM shape: w=$w d=$d cells=${cells.length}")
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        HashKernels.cmEstimate(cells, w, d, input.asInstanceOf[Long]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cmCells", cells, "long[]")
      defineCodeGen(ctx, ev, c => s"$K.cmEstimate($ref, $w, $d, $c)")
    }
    override protected def withNewChildInternal(c: Expression): CmEstimate = copy(child = c)
  }

  /** Sequential-fold dot product of two array<double> columns (the ANN hot
    * path). Bit-identical to the higher-order-function formulation and
    * DuckDB's list_dot_product on DOUBLE[]. */
  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Double.valueOf(
        HashKernels.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$K.dot($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
  }

  /** JL sign projection of an array<long> to `outDims` coordinates —
    * one codegen'd static call per row (see [[HashKernels.jlSignProject]]). */
  case class JlSignProject(child: Expression, outDims: Int) extends UnaryExpression {
    require(outDims >= 1)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      HashKernels.jlSignProject(input.asInstanceOf[ArrayData], outDims)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.jlSignProject($c, $outDims)")
    override protected def withNewChildInternal(c: Expression): JlSignProject =
      copy(child = c)
  }

  // Column-facing wrappers
  def token_hashes(text: Column): Column =
    ColumnBridge.column(TokenHashes(ColumnBridge.expression(text)))
  def shingle_hashes(ths: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(ths), n))
  def chunk_hashes(ths: Column, n: Int): Column =
    ColumnBridge.column(ChunkHashes(ColumnBridge.expression(ths), n))
  def minhash_sig(shingles: Column, as: Seq[Long], bs: Seq[Long]): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), as, bs))
  def simhash_of(ths: Column, bits: Int): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(ths), bits))
  def poly_fold(ths: Column): Column =
    ColumnBridge.column(PolyFold(ColumnBridge.expression(ths)))
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def winnow_mins(shingles: Column, w: Int): Column =
    ColumnBridge.column(WinnowMins(ColumnBridge.expression(shingles), w))
  def cm_estimate(item: Column, cells: Array[Long], w: Int, d: Int): Column =
    ColumnBridge.column(CmEstimate(ColumnBridge.expression(item), cells, w, d))
  def jl_sign_project(qv: Column, outDims: Int): Column =
    ColumnBridge.column(JlSignProject(ColumnBridge.expression(qv), outDims))
}
