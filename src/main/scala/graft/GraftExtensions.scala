package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.{CharEntropy, MinHashSignature, MinShingleMd5, ShingleHashes, SimHashBands, VectorCosineSimilarity, VectorDotProduct, VectorMean}

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
    def intArg(e: Expression, fn: String): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn expects integer literals for its size arguments, got $other")
    }
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "minhash_signature(text, shingleN, numHashes) expects 3 arguments")
        MinHashSignature(children.head,
          intArg(children(1), "minhash_signature"),
          intArg(children(2), "minhash_signature"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_bands"),
      new ExpressionInfo(classOf[SimHashBands].getName, "simhash_bands"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash_bands expects exactly 1 argument")
        SimHashBands(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("min_shingle_md5"),
      new ExpressionInfo(classOf[MinShingleMd5].getName, "min_shingle_md5"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "min_shingle_md5(text, shingleN) expects 2 arguments")
        MinShingleMd5(children.head, intArg(children(1), "min_shingle_md5"))
      }))
    def boolArg(e: Expression, fn: String): Boolean = e match {
      case Literal(v: Boolean, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn expects boolean literals for its flag arguments, got $other")
    }
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "shingle_hashes(text, shingleN, distinct, padShort) expects 4 arguments")
        ShingleHashes(children.head, intArg(children(1), "shingle_hashes"),
          boolArg(children(2), "shingle_hashes"),
          boolArg(children(3), "shingle_hashes"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "char_entropy"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "char_entropy expects exactly 1 argument")
        CharEntropy(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("vector_mean"),
      new ExpressionInfo(classOf[VectorMean].getName, "vector_mean"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "vector_mean expects exactly 1 argument")
        // the analyzer wraps a bare AggregateFunction in Complete mode
        VectorMean(children.head)
      }))
  }
}
