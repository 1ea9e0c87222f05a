package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{expr, udaf}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** Exact product aggregate — the one cross-series aggregation the reference has
  * (MultiplyStage, lang/m3/stage/MultiplyStage.java:20-41) that Spark lacks a
  * builtin for.
  *
  * `ProductDecl` is a DeclarativeAggregate: the buffer is (running product,
  * seen-any) expressed as plain Catalyst expressions, so the aggregation stays
  * inside whole-stage codegen with map-side partial aggregation — unlike a
  * typed `Aggregator`, whose buffer serialization forces ObjectHashAggregate
  * and breaks the codegen span. Null inputs are ignored; an all-null group
  * yields null (matching the reference's absent-sample semantics).
  */
case class ProductDecl(child: Expression) extends DeclarativeAggregate {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "product_exact"

  private lazy val product = AttributeReference("product", DoubleType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(product, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(1.0), Literal(false))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), product, product * child),
    If(IsNull(child), seen, Literal(true)))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    product.left * product.right,
    seen.left || seen.right)

  override lazy val evaluateExpression: Expression =
    If(seen, product, Literal(null, DoubleType))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Typed-Aggregator variant kept for API reference/tests; the codegen'd
  * ProductDecl above is what the query path uses. */
object ProductAgg extends Aggregator[java.lang.Double, (Double, Boolean), java.lang.Double] {
  override def zero: (Double, Boolean) = (1.0, false)
  override def reduce(b: (Double, Boolean), v: java.lang.Double): (Double, Boolean) =
    if (v == null) b else (b._1 * v, true)
  override def merge(a: (Double, Boolean), b: (Double, Boolean)): (Double, Boolean) =
    (a._1 * b._1, a._2 || b._2)
  override def finish(b: (Double, Boolean)): java.lang.Double =
    if (b._2) b._1 else null
  override def bufferEncoder: Encoder[(Double, Boolean)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaBoolean)
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

object Product {
  /** Register `product_exact` in the session function registry (same pattern
    * as VectorExprs.float_dot). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "product_exact", exprs => ProductDecl(exprs(0)), "scala_udf")

  private lazy val legacy = udaf(ProductAgg)

  /** product(col) as a codegen-capable Column aggregate. The column must be a
    * resolvable name/expression (registry-routed, like float_dot). */
  def product(c: Column): Column = {
    // the registry route needs an active session; fall back to the typed
    // Aggregator when none is running (plan-construction-only contexts)
    SparkSession.getActiveSession match {
      case Some(s) => register(s); expr(s"product_exact(${c.toString})")
      case None    => legacy(c)
    }
  }
}
