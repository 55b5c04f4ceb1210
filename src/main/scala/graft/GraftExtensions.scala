package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{VectorCosineSimilarity, VectorDotProduct}

/** SparkSessionExtensions hook: registers graft's native expressions so
  * plain SQL (`SELECT vector_dot(a, b)`) and downstream tools reach the
  * codegen'd implementations.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * programmatically via `GraftExtensions.install` on an existing
  * builder (what GraftSession does).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDotProduct].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vector_dot expects exactly 2 arguments")
        VectorDotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vector_cosine"),
      new ExpressionInfo(classOf[VectorCosineSimilarity].getName, "vector_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vector_cosine expects exactly 2 arguments")
        VectorCosineSimilarity(children.head, children(1))
      }))
  }
}
