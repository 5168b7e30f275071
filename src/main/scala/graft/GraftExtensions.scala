package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.expressions.{FloatVecDot, FreqItemsAgg, SimHashAgg, TokensOf}

/** Spark session extension registering graft's native expressions with the
  * SQL function registry, so `spark.sql("... vec_dot(a, b) ...")` works
  * anywhere the library's jars are on the classpath:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (Installed by default via [[GraftSession.configure]].)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDotDescriptor)
    ext.injectFunction(GraftExtensions.freqItemsDescriptor)
    ext.injectFunction(GraftExtensions.simHashDescriptor)
    ext.injectFunction(GraftExtensions.tokensDescriptor)
  }
}

object GraftExtensions {
  val vecDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "vec_dot(a, b) takes exactly two arguments")
      FloatVecDot(children.head, children(1))
    })

  /** `graft_tokens(text)` — the native Unicode `[\p{L}\p{N}]+` tokenizer. */
  val tokensDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_tokens"),
    new ExpressionInfo(classOf[TokensOf].getName, "graft_tokens"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_tokens(text) takes one argument")
      TokensOf(children.head)
    })

  /** `freq_items_agg(col, k)` — the Misra–Gries summary as a SQL
    * aggregate; `k` must be a literal int (it sizes the buffer). */
  val freqItemsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("freq_items_agg"),
    new ExpressionInfo(classOf[FreqItemsAgg].getName, "freq_items_agg"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "freq_items_agg(col, k) takes two arguments")
      val k = children(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"freq_items_agg: k must be an integer literal, got $other")
      }
      FreqItemsAgg(children.head, k).toAggregateExpression()
    })

  /** `simhash_agg(hA, hB)` — the 64-bit SimHash sketch as a SQL
    * aggregate over the two 32-bit token-hash halves. */
  val simHashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash_agg"),
    new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "simhash_agg(hA, hB) takes two arguments")
      SimHashAgg(children.head, children(1)).toAggregateExpression()
    })
}
