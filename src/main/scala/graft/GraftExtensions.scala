package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.GraftFunctions

/** Session-extensions entry point: makes every graft SQL function available
  * in ANY session without code changes, via configuration —
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * — the idiomatic Spark adoption path for a library (the same mechanism
  * table formats use). Injected functions are registered in the session's
  * catalog at build time, so `spark.sql("SELECT graft_simhash(...)")` works
  * from pure SQL clients too. The function list is
  * [[graft.functions.GraftFunctions.builders]] — the same source
  * `GraftFunctions.register` consumes, so the two adoption paths expose an
  * identical surface by construction.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
