package graft.stages

import graft.core.{QueryGrid, TsSchema}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Element-wise per-sample mappers — stateless value transforms.
  * Reference: AbstractMapperStage subclasses (lang/m3/stage/). All are single
  * codegen'd column expressions; whole-stage codegen fuses chains of them into
  * one pass, which the reference's per-stage loops cannot do.
  */
object Mappers {
  private def mapValue(df: DataFrame)(f: Column => Column): DataFrame =
    df.withColumn(TsSchema.Value, f(col(TsSchema.Value)))

  /** `abs` (ref: AbsStage.java:21-45) */
  def absStage(df: DataFrame): DataFrame = mapValue(df)(abs)

  /** `logarithm` — log base 10 (ref: LogarithmStage.java:21-52) */
  def logarithm(df: DataFrame): DataFrame = mapValue(df)(log10)

  /** `sqrt` (ref: SqrtStage.java:21-52) */
  def sqrtStage(df: DataFrame): DataFrame = mapValue(df)(sqrt)

  /** `round [precision]` (ref: RoundStage.java:22-44) */
  def roundStage(df: DataFrame, precision: Int = 0): DataFrame =
    mapValue(df)(round(_, precision))

  /** `scale f` (ref: ScaleStage.java:21-43) */
  def scale(df: DataFrame, factor: Double): DataFrame = mapValue(df)(_ * factor)

  /** `divideScalar d` (ref: DivideScalarStage.java:21-44) */
  def divideScalar(df: DataFrame, d: Double): DataFrame = mapValue(df)(_ / d)

  /** `offset c` (ref: OffsetStage.java:21-43) */
  def offsetStage(df: DataFrame, c: Double): DataFrame = mapValue(df)(_ + c)

  /** `scaleToSeconds s` — v * s / stepSeconds (ref: ScaleToSecondsStage.java:26-42) */
  def scaleToSeconds(df: DataFrame, grid: QueryGrid, seconds: Double): DataFrame =
    mapValue(df)(_ * seconds / (grid.stepMs / 1000.0))
}
