package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact product aggregate — the one cross-series aggregation the reference has
  * (MultiplyStage, lang/m3/stage/MultiplyStage.java:20-41) that Spark lacks a
  * builtin for. Implemented as a typed Aggregator (partial-merge capable, so
  * Catalyst still does map-side partial aggregation; buffer is a single double,
  * mirroring the reference's running-product sample merge).
  */
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
  private lazy val fn = udaf(ProductAgg)
  /** product(col) as a Column aggregate. */
  def product(c: Column): Column = fn(c)
}
