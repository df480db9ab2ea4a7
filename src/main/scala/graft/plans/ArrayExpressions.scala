package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expressions for the vector hot path (SURVEY §7.4:
  * "optional codegen Expression for dot-product if bench demands") —
  * the (b) rung of the custom-operator ladder: a scalar `Expression`
  * with `doGenCode`, before reaching for a custom physical operator.
  *
  * Semantics match `graft.functions.Vectors.dot` on equal-length,
  * null-free arrays (sequential double accumulation in element order
  * — the domain every caller and spec exercises), so swapping one for
  * the other never changes oracle results — only removes the
  * per-element lambda-call overhead of the higher-order-function path.
  * Outside that domain they differ: the HOF form yields null on a
  * length mismatch or null element; DotProductD min-truncates and
  * must not be fed null elements.
  */
object ArrayExpressions {

  /** Dot product of two ArrayType(DoubleType) columns, whole-stage
    * codegen'd to a tight primitive loop.
    */
  case class DotProductD(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |${ev.value} = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Hamming distance between two 64-bit signature halves packed as
    * longs (the SimHash near-dup comparator), codegen'd to Long.bitCount.
    */
  case class HammingDistance64(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes = Seq(LongType, LongType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hamming64"

    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long]).toLong

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        (a, b) => s"${ev.value} = (long) java.lang.Long.bitCount($a ^ $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column builders (usable without any session registration). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProductD(Bridge.expression(a), Bridge.expression(b)))

  def hamming64(a: Column, b: Column): Column =
    Bridge.column(HammingDistance64(Bridge.expression(a), Bridge.expression(b)))
}

/** SQL-name registration via SparkSessionExtensions — enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`, then call `graft_dot(a, b)`
  * / `graft_hamming64(x, y)` from SQL. For an already-built session use
  * `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {
  private val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayExpressions.DotProductD].getName, "graft_dot"),
      (children: Seq[Expression]) =>
        ArrayExpressions.DotProductD(children(0), children(1))),
    (FunctionIdentifier("graft_hamming64"),
      new ExpressionInfo(classOf[ArrayExpressions.HammingDistance64].getName, "graft_hamming64"),
      (children: Seq[Expression]) =>
        ArrayExpressions.HammingDistance64(children(0), children(1))))

  /** Register into a live session (withExtensions only applies at
    * construction time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (name, info, builder) =>
      Bridge.registerFunction(spark, name, info, builder)
    }
}
