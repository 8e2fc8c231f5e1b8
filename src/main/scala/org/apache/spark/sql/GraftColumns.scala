package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the engine's native Catalyst expressions and the public
  * `Column` API. In Spark 4 `Column` is connect-agnostic and its
  * Expression-backed constructor moved behind `private[sql]`
  * (`classic.ExpressionUtils`), so this bridge lives in the
  * `org.apache.spark.sql` package — the standard pattern for libraries
  * that ship custom codegen expressions without a session extension.
  */
object GraftColumns {
  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def of(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression (classic sessions). */
  def expr(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native expression as a session-local SQL function, so
    * `spark.sql("SELECT graft_dot_product(a, b) ...")` works alongside
    * the Column API. Runtime-registerable on ANY live session — unlike
    * `SparkSessionExtensions.injectFunction`, which only applies at
    * session construction and therefore can't serve the driver-owned
    * sessions this engine is handed (SURVEY §3: Verify/Bench receive
    * prebuilt sessions). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
