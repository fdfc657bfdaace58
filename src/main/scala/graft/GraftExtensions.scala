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
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[expressions.JaroWinkler].getName,
        "graft_jaro_winkler"),
      (exprs: Seq[Expression]) =>
        expressions.JaroWinkler(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[expressions.SimHash].getName,
        "graft_simhash"),
      (exprs: Seq[Expression]) => expressions.SimHash(exprs.head)))
    // the O(n) series-scan family (same literal-parameter coercion as
    // SeriesScan.register; parameters arrive as foldable expressions)
    def litD(e: Expression): Double = e.eval() match {
      case d: Double => d
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case f: Float => f.toDouble
      case n: Number => n.doubleValue()
      case other => other.toString.toDouble
    }
    ext.injectFunction((
      FunctionIdentifier("graft_garch_scan"),
      new ExpressionInfo(classOf[expressions.GarchScan].getName,
        "graft_garch_scan"),
      (es: Seq[Expression]) =>
        expressions.GarchScan(es.head, litD(es(1)), litD(es(2)), litD(es(3)))))
    ext.injectFunction((
      FunctionIdentifier("graft_kalman_scan"),
      new ExpressionInfo(classOf[expressions.KalmanScan].getName,
        "graft_kalman_scan"),
      (es: Seq[Expression]) =>
        expressions.KalmanScan(es.head, litD(es(1)), litD(es(2)))))
    ext.injectFunction((
      FunctionIdentifier("graft_holt_scan"),
      new ExpressionInfo(classOf[expressions.HoltScan].getName,
        "graft_holt_scan"),
      (es: Seq[Expression]) =>
        expressions.HoltScan(es.head, litD(es(1)), litD(es(2)))))
    ext.injectFunction((
      FunctionIdentifier("graft_heikin_scan"),
      new ExpressionInfo(classOf[expressions.HeikinScan].getName,
        "graft_heikin_scan"),
      (es: Seq[Expression]) => expressions.HeikinScan(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_ema_scan"),
      new ExpressionInfo(classOf[expressions.EmaScan].getName,
        "graft_ema_scan"),
      (es: Seq[Expression]) =>
        expressions.EmaScan(es.head, litD(es(1)), litD(es(2)))))
    ext.injectFunction((
      FunctionIdentifier("graft_adx_scan"),
      new ExpressionInfo(classOf[expressions.AdxScan].getName,
        "graft_adx_scan"),
      (es: Seq[Expression]) =>
        expressions.AdxScan(es.head, litD(es(1)), litD(es(2)))))
    ext.injectFunction((
      FunctionIdentifier("graft_cusum_scan"),
      new ExpressionInfo(classOf[expressions.CusumScan].getName,
        "graft_cusum_scan"),
      (es: Seq[Expression]) => expressions.CusumScan(es.head, es(1))))
  }
}
