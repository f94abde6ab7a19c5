package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import graft.functions.HashExpressions._

/** SQL-surface registration for graft's native expressions, so SQL users can
  * call them without the Scala DSL:
  *
  * {{{
  * GraftFunctions.register(spark)
  * spark.sql("SELECT graft_simhash(graft_token_hashes(text), 32) FROM docs")
  * }}}
  *
  * For zero-code adoption at session build, see [[graft.GraftExtensions]] —
  * BOTH paths consume [[builders]], so the two SQL surfaces cannot drift.
  */
object GraftFunctions {

  /** The single source of truth for the SQL function surface. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_token_hashes"   -> (exprs => TokenHashes(exprs.head)),
    "graft_shingle_hashes" -> (exprs =>
      ShingleHashes(exprs.head, exprs(1).eval(null).asInstanceOf[Int])),
    "graft_chunk_hashes"   -> (exprs =>
      ChunkHashes(exprs.head, exprs(1).eval(null).asInstanceOf[Int])),
    "graft_poly_fold"      -> (exprs => PolyFold(exprs.head)),
    "graft_simhash"        -> (exprs =>
      SimHash(exprs.head, exprs(1).eval(null).asInstanceOf[Int])),
    "graft_dot"            -> (exprs => DotProduct(exprs.head, exprs(1))))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
