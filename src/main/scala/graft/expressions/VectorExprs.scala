package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DecimalType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expression for float-vector dot products.
  *
  * The similarity/dedup hot path evaluates a dot product per candidate
  * PAIR (O(n·k) to O(n²) evaluations). The declarative form —
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` — allocates a zipped array
  * and runs the interpreted higher-order-function evaluator per pair;
  * this expression compiles to a tight primitive loop inside whole-stage
  * codegen (measured ~20× faster at 2M pairs, q52).
  *
  * Semantics are identical to the declarative form: elementwise
  * float→double widening, left-to-right summation — so results stay
  * bit-equal to the DuckDB oracle's sequential `list_sum`.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float> inputs, got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression for exact integer-vector dot products
  * surfaced as DECIMAL(38,0).
  *
  * The semantic-dedup verify (q149/q153) evaluates an EXACT dot per
  * candidate pair — and its threshold predicate references the dot
  * three times (dot > 0, 400·dot² ≥ 361·na2·nb2, and the displayed
  * cosine), so the declarative
  * `aggregate(zip_with(a, b, (x,y) -> CAST(x AS DECIMAL(38,0))*y), …)`
  * form runs the interpreted higher-order-function evaluator (zipped
  * array allocation + per-element Decimal boxing) up to three times
  * per pair (r17 plan audit: the whole fold is inlined verbatim into
  * the join CONDITION twice plus the projection). This expression is
  * the [[FloatVecDot]] treatment for the integer lattice: a primitive
  * long loop, escalating to BigInteger only if a step would overflow
  * int64 — bit-identical to the Decimal fold for every input (both
  * compute the exact integer Σ aᵢ·bᵢ; DECIMAL(38,0) never rounds).
  */
case class LongVecDotDecimal(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<bigint> inputs, got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }
  override def dataType: DataType = DecimalType(38, 0)
  // a > 38-digit sum degrades to null, the CheckOverflow convention the
  // declarative Decimal fold carried — so the slot must stay nullable
  override def nullable: Boolean = true
  override def prettyName: String = "long_vec_dot_dec"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LongVecDotDecimal.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      // one monomorphic static call per row — no lambda interpretation,
      // no zipped-array allocation; the helper stays on primitive longs
      // until an overflow check fails (never, at sane component sizes)
      s"${ev.value} = graft.expressions.LongVecDotDecimal.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongVecDotDecimal {
  /** Exact Σ aᵢ·bᵢ over the common prefix, as Decimal(38,0). Fast path
    * accumulates in one long (overflow-checked); the BigInteger path
    * continues from the partial sum, so the result is the exact integer
    * either way. */
  def dot(x: ArrayData, y: ArrayData): Decimal = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    var big: java.math.BigInteger = null
    while (i < n && big == null) {
      try {
        s = Math.addExact(s, Math.multiplyExact(x.getLong(i), y.getLong(i)))
        i += 1
      } catch { case _: ArithmeticException =>
        big = java.math.BigInteger.valueOf(s)
      }
    }
    val d =
      if (big == null) Decimal(s)
      else {
        while (i < n) {
          big = big.add(java.math.BigInteger.valueOf(x.getLong(i))
            .multiply(java.math.BigInteger.valueOf(y.getLong(i))))
          i += 1
        }
        Decimal(new java.math.BigDecimal(big))
      }
    // changePrecision is the public path generated code itself uses; a
    // > 38-digit sum degrades to null, the CheckOverflow convention
    if (d.changePrecision(38, 0)) d else null
  }
}

object VectorExprs {
  /** Dot product of two `array<float>` columns, as double. */
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(FloatVecDot(Bridge.expression(a), Bridge.expression(b)))

  /** L2 norm of an `array<float>` column, as double. */
  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  /** Exact integer dot of two `array<bigint>` columns, as
    * DECIMAL(38,0) — the codegen'd twin of the
    * `aggregate(zip_with(…, CAST AS DECIMAL(38,0) …))` fold. */
  def vecDotDec(a: Column, b: Column): Column =
    Bridge.column(LongVecDotDecimal(Bridge.expression(a), Bridge.expression(b)))
}
