package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library entry point for cluster-wide installation:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * installs the engine's native codegen'd functions into every session
  * built on the cluster — no per-session `register()` calls, and the
  * functions are available from pure SQL. The per-session `register()`
  * helpers on each expression object remain for embedded/test use;
  * `LshBucket` stays per-shape there because its plane matrix is a
  * constructor constant.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[expressions.CosineSimilarity].getName,
        "graft_cosine"),
      (exprs: Seq[Expression]) =>
        expressions.CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[expressions.SimHash].getName,
        "graft_simhash"),
      (exprs: Seq[Expression]) => expressions.SimHash(exprs.head)))
  }
}
