package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.HashExpressions._

/** Session-extensions entry point: makes every graft SQL function available
  * in ANY session without code changes, via configuration —
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * — the idiomatic Spark adoption path for a library (the same mechanism
  * Delta/Iceberg use). Injected functions are registered in the session's
  * catalog at build time, so `spark.sql("SELECT graft_simhash(...)")` works
  * from pure SQL clients too. [[graft.functions.GraftFunctions.register]]
  * remains for post-hoc registration on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_token_hashes"), info("graft_token_hashes"),
      (exprs: Seq[Expression]) => TokenHashes(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"), info("graft_shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs.head, exprs(1).eval(null).asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("graft_poly_fold"), info("graft_poly_fold"),
      (exprs: Seq[Expression]) => PolyFold(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_simhash"), info("graft_simhash"),
      (exprs: Seq[Expression]) => SimHash(exprs.head, exprs(1).eval(null).asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("graft_dot"), info("graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
  }
}
