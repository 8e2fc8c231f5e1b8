package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two `array<float>`/`array<double>`
  * columns (SURVEY.md §2.11 — the one custom Catalyst Expression the
  * survey budgets; r2 verdict item 1).
  *
  * Why not `aggregate(zip_with(a, b, ...))`: Spark higher-order
  * functions are NOT whole-stage-codegen'd — they evaluate their lambda
  * interpretively per element and `zip_with` allocates a fresh array per
  * call (~1.5 ms per 64-dim pair measured at r2). This expression
  * generates a primitive Java loop over the two [[ArrayData]] — no
  * allocation, no virtual calls in the hot path — and participates in
  * whole-stage codegen, so the scoring loop of a 100 TB similarity join
  * stays inside one generated function.
  *
  * Numeric contract (what makes results oracle-comparable): elements are
  * widened float→double (exact) and accumulated STRICTLY left-to-right —
  * the same fold order as `aggregate(zip_with(...), 0D, (acc, v) -> acc
  * + v)` and DuckDB's `list_reduce`, so all three produce bit-identical
  * doubles. Null semantics also mirror the HOF fold: null array, length
  * mismatch (zip_with pads with null), or any null element ⇒ null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product needs two array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  /** Nullable beyond the children: length mismatch / null element ⇒ null. */
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = lt match {
        case FloatType => x.getFloat(i).toDouble
        case _ => x.getDouble(i)
      }
      val yv = rt match {
        case FloatType => y.getFloat(i).toDouble
        case _ => y.getDouble(i)
      }
      s += xv * yv
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val getA = CodeGenerator.getValue(a, elemType(left), i)
      val getB = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ((double) $getA) * ((double) $getB);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot_product"
}

/** Column-level vector math built on the native expressions. */
object VectorOps {
  /** Codegen'd dot product of two array<float|double> columns. */
  def dot(a: Column, b: Column): Column =
    GraftColumns.of(DotProduct(GraftColumns.expr(a), GraftColumns.expr(b)))

  /** L2 norm via the same codegen'd loop (dot(v, v) then sqrt) — the
    * fold order matches `aggregate(transform(v, x -> x*x), 0D, +)`. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** All random-hyperplane sign bits in one codegen pass
    * ([[RpSignature]]). */
  def rpSignature(v: Column, planes: Int): Column =
    GraftColumns.of(RpSignature(GraftColumns.expr(v), planes))
}
