package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Row-local Bloom membership probe whose filter travels as a
  * BROADCAST VARIABLE, not as a plan literal (r9 verdict item 4).
  *
  * Spark's own `BloomFilterMightContain` takes the serialized filter
  * as a child *expression*; feeding it an inline binary `Literal`
  * embeds the filter in the expression tree, so every serialized plan
  * fragment, every `explain` string, and every AQE re-plan carries the
  * full filter bytes — at the multi-MB sizes the decontamination
  * prefilter rung targets (default 4M keys ≈ 4.8 MB at 1% fpp), that
  * is exactly the overhead Spark's runtime bloom-join avoids by
  * routing the filter through a scalar subquery. This expression keeps
  * only the `Broadcast` HANDLE in the tree (a few bytes of plan); the
  * bytes move once per executor over the torrent protocol and are
  * deserialized ONCE per generated-class instance into a mutable-state
  * slot, so the per-row hot path is a direct `mightContainLong` call
  * inside whole-stage codegen — identical to the literal form's.
  *
  * Null semantics mirror `BloomFilterMightContain`: null key ⇒ null.
  */
case class BloomMightContain(bloomBc: Broadcast[Array[Byte]],
    child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain needs a bigint key, got " +
        child.dataType.catalogString)

  override def dataType: DataType = BooleanType

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBc.value))

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftBloomBc", bloomBc,
      classOf[Broadcast[_]].getName)
    val bfCls = classOf[BloomFilter].getName
    val bloom = ctx.addMutableState(bfCls, "graftBloom",
      v => s"""
        try {
          $v = $bfCls.readFrom(new java.io.ByteArrayInputStream(
            (byte[]) $bcRef.value()));
        } catch (java.io.IOException e) {
          throw new RuntimeException(e);
        }""")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bloom.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContain = copy(child = newChild)

  override def toString: String =
    s"graft_bloom_might_contain(broadcast_${bloomBc.id}, $child)"

  override def sql: String = s"graft_bloom_might_contain(${child.sql})"
}
