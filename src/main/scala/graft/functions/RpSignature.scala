package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** All `planes` random-hyperplane sign bits of a vector in ONE codegen
  * pass (bit j of the result = [projection of v onto deterministic
  * hyperplane j] > 0).
  *
  * The naive formulation is `planes` separate higher-order folds — 16
  * interpreted passes over every vector (measured ~2.5 s of q30's sf0.1
  * time). This expression keeps one running sum per plane inside a
  * generated nested loop: a single pass over the array, no allocation
  * but the small per-row sums buffer, whole-stage-codegen'd.
  *
  * Determinism contract: the hyperplane weight for (plane j, dim i) is
  * ±1 from the affine parity hash `((1000003·(j·8192 + i) + 12345) mod
  * 1e9+7) AND 1` — pure integer arithmetic any engine replays — and
  * each plane's sum accumulates in ascending-i order, identical to the
  * per-plane left fold the DuckDB oracle runs. Bits therefore match
  * bit-for-bit. Null array or any null element ⇒ null (the fold's
  * semantics).
  */
case class RpSignature(child: Expression, planes: Int)
    extends UnaryExpression {

  require(planes > 0 && planes <= 63, s"planes=$planes must be in [1, 63]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"rp_signature needs array<float|double>, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  /** ±1 weight for (plane j, dim i) — keep in lockstep with doGenCode
    * and the oracle SQL. */
  private def sign(j: Int, i: Int): Double =
    (1L - 2L * (((1000003L * (j * 8192L + i) + 12345L) % 1000000007L) & 1L))
      .toDouble

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val sums = new Array[Double](planes)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = elemType match {
        case FloatType => v.getFloat(i).toDouble
        case _ => v.getDouble(i)
      }
      var j = 0
      while (j < planes) { sums(j) += x * sign(j, i); j += 1 }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < planes) { if (sums(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val sums = ctx.freshName("sums")
      val sig = ctx.freshName("sig")
      val getV = CodeGenerator.getValue(v, elemType, i)
      s"""
         |final int $n = $v.numElements();
         |final double[] $sums = new double[$planes];
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $x = (double) $getV;
         |  for (int $j = 0; $j < $planes; $j++) {
         |    $sums[$j] += $x * (double) (1L - 2L *
         |      (((1000003L * ($j * 8192L + $i) + 12345L) % 1000000007L) & 1L));
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $sig = 0L;
         |  for (int $j = 0; $j < $planes; $j++) {
         |    if ($sums[$j] > 0) $sig |= 1L << $j;
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : RpSignature = copy(child = newChild)

  override def prettyName: String = "graft_rp_signature"
}
