package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hashing and vector kernels.
  *
  * Motivation (measured, not guessed): the same kernels composed from
  * built-in higher-order functions (`transform`/`aggregate` with lambdas) are
  * interpreted per element — a bench stack dump showed a single task burning
  * ~1000 s in nested `ArrayTransform.eval` at sf0.1. These expressions do the
  * identical arithmetic in one tight JVM loop per row: same results (the
  * DuckDB oracle SQL is unchanged), orders of magnitude less dispatch.
  *
  * Semantics note: byte-level (b & 0xff) == DuckDB `ascii(c)` per character
  * for ASCII text, which is the contract of this corpus; documented in
  * TextFunctions.
  */
object HashExpressions {
  val P: Long = 1000000007L

  /** Polynomial hash of each whitespace-separated token: array<long>.
    * Equivalent to transform(split(s,' '), t -> fold ascii (acc*31+c)%P). */
  case class TokenHashes(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      val out = new java.util.ArrayList[Long]()
      var acc = 0L
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        if (b == ' ') { out.add(acc); acc = 0L }
        else acc = (acc * 31L + b) % P
        i += 1
      }
      out.add(acc) // split(' ') on a non-empty string always yields >= 1 token
      val arr = new Array[Long](out.size)
      var j = 0
      while (j < arr.length) { arr(j) = out.get(j); j += 1 }
      new GenericArrayData(arr)
    }
    override protected def withNewChildInternal(c: Expression): TokenHashes = copy(c)
  }

  /** Word n-gram shingle hashes from token hashes: array<long> of length
    * max(0, numTokens - n + 1); shingle_i = fold of n token hashes. */
  case class ShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val ths = input.asInstanceOf[ArrayData]
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
    override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
  }

  /** All MinHash components in ONE pass over the shingle array:
    * out[j] = min over shingles of (a(j)*s + b(j)) % P, or P if empty. */
  case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long])
      extends UnaryExpression with CodegenFallback {
    require(as.length == bs.length)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private val aArr = as.toArray
    private val bArr = bs.toArray
    override def nullSafeEval(input: Any): Any = {
      val sh = input.asInstanceOf[ArrayData]
      val k = aArr.length
      val mins = Array.fill(k)(P)
      val cnt = sh.numElements()
      var i = 0
      while (i < cnt) {
        val s = sh.getLong(i)
        var j = 0
        while (j < k) {
          val h = (aArr(j) * s + bArr(j)) % P
          if (h < mins(j)) mins(j) = h
          j += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  }

  /** SimHash over token hashes in one pass: bit j of the result is 1 iff the
    * sum over tokens of ((h>>j)&1)*2-1 is positive. */
  case class SimHash(child: Expression, bits: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val ths = input.asInstanceOf[ArrayData]
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
      java.lang.Long.valueOf(out)
    }
    override protected def withNewChildInternal(c: Expression): SimHash = copy(child = c)
  }

  /** Left-fold polynomial combine of an array<long>: fold (acc*31+x)%P from 0.
    * (With acc0 = 0 the first step yields x0, matching DuckDB list_reduce.) */
  case class PolyFold(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      var acc = 0L
      var i = 0
      val cnt = a.numElements()
      while (i < cnt) { acc = (acc * 31L + a.getLong(i)) % P; i += 1 }
      java.lang.Long.valueOf(acc)
    }
    override protected def withNewChildInternal(c: Expression): PolyFold = copy(c)
  }

  /** Sequential-fold dot product of two array<double> columns, with
    * whole-stage codegen (this sits in the ANN hot path). Bit-identical to
    * the higher-order-function formulation and DuckDB's list_dot_product. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      val n = math.min(a.numElements(), b.numElements())
      while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
      java.lang.Double.valueOf(acc)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
  }

  // Column-facing wrappers
  def token_hashes(text: Column): Column = ColumnBridge.column(TokenHashes(ColumnBridge.expression(text)))
  def shingle_hashes(ths: Column, n: Int): Column = ColumnBridge.column(ShingleHashes(ColumnBridge.expression(ths), n))
  def minhash_sig(shingles: Column, as: Seq[Long], bs: Seq[Long]): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), as, bs))
  def simhash_of(ths: Column, bits: Int): Column = ColumnBridge.column(SimHash(ColumnBridge.expression(ths), bits))
  def poly_fold(ths: Column): Column = ColumnBridge.column(PolyFold(ColumnBridge.expression(ths)))
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
