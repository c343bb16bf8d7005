package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions installer for the engine's native functions and
  * optimizer rules — the deployment-grade registration path (vs. the
  * per-session [[PolyHash.register]]): ships in the session from
  * construction via
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * so SQL text, views, and thrift-served queries all resolve `poly_hash`,
  * and every query benefits from
  * [[graft.plans.MergeDisjointFilterUnions]] — on a 1000-executor cluster
  * the config string is the only wiring needed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolyHash.fromArgs(exprs)))
    ext.injectOptimizerRule(_ => graft.plans.MergeDisjointFilterUnions)
  }
}
