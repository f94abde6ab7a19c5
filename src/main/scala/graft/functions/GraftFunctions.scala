package graft.functions

import org.apache.spark.sql.SparkSession
import graft.functions.HashExpressions._

/** SQL-surface registration for graft's native expressions, so SQL users can
  * call them without the Scala DSL:
  *
  * {{{
  * GraftFunctions.register(spark)
  * spark.sql("SELECT graft_simhash(graft_token_hashes(text), 32) FROM docs")
  * }}}
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_token_hashes",
      exprs => TokenHashes(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_shingle_hashes",
      exprs => ShingleHashes(exprs.head, exprs(1).eval(null).asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction("graft_poly_fold",
      exprs => PolyFold(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash",
      exprs => SimHash(exprs.head, exprs(1).eval(null).asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DotProduct(exprs.head, exprs(1)), "scala_udf")
  }
}
