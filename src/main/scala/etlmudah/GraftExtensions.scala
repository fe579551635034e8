package etlmudah

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import etlmudah.expr.CosineSimilarity

/** SparkSessionExtensions entry point registering the engine's native
  * expressions. Enable with:
  *   .config("spark.sql.extensions", "etlmudah.GraftExtensions")
  * after which `graft_cosine(a, b)` resolves in SQL and via
  * functions.call_function. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children.head, children(1))))
  }
}
