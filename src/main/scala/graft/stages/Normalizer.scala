package graft.stages

import graft.core.{OracleSafe, QueryGrid, TsSchema}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Step normalization for combining series with different resolutions —
  * the reference's TimeSeriesNormalizer (query/aggregator/
  * TimeSeriesNormalizer.java:16-45): before a binary projection, series are
  * resampled onto a common grid whose step is the LCM (or MAX) of the input
  * steps; samples falling into one target slot are merged by a consolidation
  * function (ConsolidationFunction.java:22-123 — AVG default, SUM, MAX, MIN,
  * LAST; TYPE_AWARE = SUM for `type:counter` series else AVG).
  */
object Normalizer {
  private val S = TsSchema

  def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
  def lcm(a: Long, b: Long): Long = a / gcd(a, b) * b

  /** Common step for a set of input steps (LCM strategy, MAX fallback when the
    * LCM explodes past the query range — ref TimeSeriesNormalizer:16-45). */
  def commonStep(steps: Seq[Long], rangeMs: Long): Long = {
    val l = steps.reduce(lcm)
    if (l > rangeMs) steps.max else l
  }

  private def consolidate(fn: String): Column => Column = fn match {
    case "avg"  => OracleSafe.dAvg
    case "sum"  => OracleSafe.dSum
    case "max"  => max(_)
    case "min"  => min(_)
    case "last" => c => expr(s"max_by(${S.Value}, ${S.Ts})")
    case other  => throw new IllegalArgumentException(s"consolidation fn: $other")
  }

  /** Resample a canonical samples DF onto `targetGrid` with the given
    * consolidation function. One shuffle on (series, slot). */
  def resample(df: DataFrame, targetGrid: QueryGrid, fn: String = "avg"): DataFrame = {
    val slot = targetGrid.bucket(col(S.Ts))
    df.withColumn("_slot", slot)
      .where(col("_slot") >= targetGrid.startMs && col("_slot") < targetGrid.endMs)
      .groupBy(col(S.SeriesId), col(S.LabelsCol), col("_slot").as(S.Ts))
      .agg(consolidate(fn)(col(S.Value)).as(S.Value))
      .select(S.SeriesId, S.LabelsCol, S.Ts, S.Value)
  }

  /** TYPE_AWARE consolidation: SUM for series labeled type:counter, AVG
    * otherwise (ref: ConsolidationFunction.TYPE_AWARE). */
  def resampleTypeAware(df: DataFrame, targetGrid: QueryGrid): DataFrame = {
    val slot = targetGrid.bucket(col(S.Ts))
    val isCounter = col(S.LabelsCol).getItem("type") === "counter"
    df.withColumn("_slot", slot)
      .where(col("_slot") >= targetGrid.startMs && col("_slot") < targetGrid.endMs)
      .groupBy(col(S.SeriesId), col(S.LabelsCol), col("_slot").as(S.Ts))
      .agg(
        OracleSafe.dSum(col(S.Value)).as("_sum"),
        OracleSafe.dAvg(col(S.Value)).as("_avg"),
        first(isCounter).as("_counter"))
      .withColumn(S.Value, when(col("_counter"), col("_sum")).otherwise(col("_avg")))
      .select(S.SeriesId, S.LabelsCol, S.Ts, S.Value)
  }

  /** Normalize two inputs with (possibly) different native steps onto their
    * common grid, then both sides are safe for a binary projection. Range =
    * union of both (ref: output range = union). */
  def normalizePair(left: DataFrame, leftStep: Long, right: DataFrame, rightStep: Long,
                    range: QueryGrid, fn: String = "avg"): (DataFrame, DataFrame, QueryGrid) = {
    if (leftStep == rightStep) (left, right, range.copy(stepMs = leftStep))
    else {
      val step = commonStep(Seq(leftStep, rightStep), range.endMs - range.startMs)
      val target = range.copy(stepMs = step)
      (resample(left, target, fn), resample(right, target, fn), target)
    }
  }
}
