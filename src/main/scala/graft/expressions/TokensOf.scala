package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer: maximal `[a-z0-9]+` runs of the lowercased input.
  *
  * Semantically IDENTICAL to the declarative form
  * `regexp_extract_all(lower(text), "[a-z0-9]+", 0)` for every input —
  * same lowercasing (`UTF8String.toLowerCase`, what `Lower` compiles
  * to), and the token class is pure ASCII, so a byte scan over the
  * lowercased UTF-8 finds exactly the regex's maximal runs (multi-byte
  * sequences use bytes ≥ 0x80, never inside the class). The payoff is
  * skipping the regex engine on the single hottest primitive in the
  * library — tokenization feeds ~40 text/span/dedup operators — with a
  * tight byte loop inside whole-stage codegen instead of per-row
  * `java.util.regex` matcher iteration (measured ~6 % end-to-end on
  * tokenize-dominated operators at sf0.1, A/B same host — modest
  * because downstream shingling/aggregation dominates those plans, but
  * free and strictly per-row-cheaper at any scale). The DuckDB oracle
  * keeps replaying the regex form
  * ([[graft.text.Text.toksSql]]); the driver's hash compare across all
  * token-consuming operators is the cross-engine equivalence proof,
  * and a property spec fuzzes the two forms against each other on
  * mixed ASCII/Unicode inputs.
  */
case class TokensOf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  // containsNull = true: schema-identical to regexp_extract_all, so
  // swapping the implementations never changes a dumped parquet schema
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_tokens"

  override protected def nullSafeEval(s: Any): Any =
    TokensOf.tokenize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokensOf.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokensOf {
  /** Maximal [a-z0-9]+ runs of `s.toLowerCase`, as an array of strings. */
  def tokenize(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    var start = -1
    while (i < bytes.length) {
      val b = bytes(i)
      val tok = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (tok) { if (start < 0) start = i }
      else if (start >= 0) {
        out += UTF8String.fromBytes(bytes, start, i - start)
        start = -1
      }
      i += 1
    }
    if (start >= 0) out += UTF8String.fromBytes(bytes, start, bytes.length - start)
    new GenericArrayData(out.toArray)
  }

  /** Column form (the [[graft.text.Text.tokens]] implementation). */
  def tokens(text: Column): Column =
    Bridge.column(TokensOf(Bridge.expression(text)))
}
