package graft.stages

import graft.core.{OracleSafe, TsSchema}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Whole-series-set operators: sort / head / tail / topK, union, and the binary
  * label-matched projections (divide/diff/asPercent).
  *
  * These are the reference's coordinator-only stages (PipelineStage.isCoordinatorOnly,
  * query/stage/PipelineStage.java:82) — the ones that need a global view. In
  * Spark they are the stages that introduce a shuffle; topK/limit pushes
  * partial ordering into each partition (TakeOrderedAndProject), matching the
  * reference's shard-local-topK + coordinator re-merge
  * (ref: TopKStage.java:33-47,108,172).
  */
object SeriesSet {
  private val S = TsSchema

  /** Per-series ranking key (ref: stage/util/SortComparatorUtil.java;
    * SortByType avg,current,max,min,sum,stddev,name —
    * lang/m3/common/SortByType.java:14-43; `current` = last non-null value). */
  private def seriesKeyAgg(by: String): Column = by match {
    case "avg"     => OracleSafe.dAvg(col(S.Value))
    case "sum"     => OracleSafe.dSum(col(S.Value))
    case "max"     => max(col(S.Value))
    case "min"     => min(col(S.Value))
    case "current" => expr(s"max_by(${S.Value}, ${S.Ts})")
    case "stddev" =>
      val n = count(col(S.Value)).cast(DoubleType)
      val s1 = OracleSafe.dSum(col(S.Value))
      val s2 = OracleSafe.dSum(col(S.Value) * col(S.Value))
      when(n > 1, sqrt((s2 - s1 * s1 / n) / (n - lit(1.0))))
    case other => throw new IllegalArgumentException(s"sort by: $other")
  }

  /** Attach `_rank` = dense series rank by the key (ties broken by series key
    * string for determinism). Single narrow shuffle on the tiny per-series
    * aggregate, then broadcast back. */
  private def ranked(df0: DataFrame, by: String, desc: Boolean): DataFrame = {
    val df = df0.drop("_rank")
    val keys =
      if (by == "name") df.select(col(S.SeriesId), TsSchema.seriesKey(col(S.LabelsCol)).as("_skey"))
        .distinct().withColumn("_key", col("_skey").cast(StringType))
      else df.groupBy(S.SeriesId)
        .agg(seriesKeyAgg(by).as("_key"), first(TsSchema.seriesKey(col(S.LabelsCol))).as("_skey"))
    val ord =
      if (desc) Seq(col("_key").desc_nulls_last, col("_skey").asc)
      else Seq(col("_key").asc_nulls_last, col("_skey").asc)
    val rk = keys.withColumn("_rank", row_number().over(Window.orderBy(ord: _*)))
      .select(S.SeriesId, "_rank")
    df.join(broadcast(rk), Seq(S.SeriesId))
  }

  /** `sort [by] [asc|desc]` — order the series list (ref: SortStage.java:27-41).
    * Emits `_rank` so a downstream formatter can emit series in order. */
  def sortSeries(df: DataFrame, by: String = "avg", desc: Boolean = true): DataFrame =
    ranked(df, by, desc).orderBy(col("_rank"), col(S.Ts))

  /** `head n` / `tail n` — first/last n series by rank (ref: SliceStage.java:30-44). */
  def slice(df: DataFrame, n: Int, by: String = "avg", desc: Boolean = true,
            tail: Boolean = false): DataFrame = {
    // a preceding `sort` stage's ranking is honored (ref SliceStage takes the
    // head of the CURRENT series order); else rank by the default key
    val r = if (df.columns.contains("_rank")) df else ranked(df, by, desc)
    val total = r.select(max("_rank")).first().getInt(0)
    val keep = if (tail) col("_rank") > total - n else col("_rank") <= n
    r.where(keep)
  }

  /** `topK k by order` (ref: TopKStage.java:33-47; defaults k=10, by=current). */
  def topK(df: DataFrame, k: Int = 10, by: String = "current", desc: Boolean = true): DataFrame =
    ranked(df, by, desc).where(col("_rank") <= k)

  /** `union <ref…>` — concatenate series sets, duplicates retained
    * (ref: UnionStage.java:23-30). */
  def union(dfs: Seq[DataFrame]): DataFrame =
    dfs.map(_.select(S.SeriesId, S.LabelsCol, S.Ts, S.Value)).reduce(_ unionByName _)

  /** Label-match key for binary projections: all labels, or only `keys`
    * (ref: AbstractBinaryProjectionStage.java:58-96). */
  private def matchKey(keys: Seq[String]): Column =
    if (keys.isEmpty) TsSchema.seriesKey(col(S.LabelsCol))
    else concat_ws("", keys.map(k => coalesce(col(S.LabelsCol).getItem(k), lit(""))): _*)

  /** Binary projection core (ref: AbstractBinaryProjectionStage):
    *  - right side with a SINGLE series (or a single group after key
    *    projection) matches EVERY left series with no label check at all
    *    (ref :243-249, :341-346 "If right operand has single series, project
    *    all left ... without label matching")
    *  - otherwise match on all labels, or only `keys`; multiple right series
    *    in one group are merged first-wins (ref :90-110 groupAndMerge)
    *  - per-timestamp equi-join; keepNans=false drops mismatches (inner join)
    *  - output labels = transformed LEFT labels (`typeLabel`, e.g.
    *    divide/asPercent add type:ratios — DivideStage.java:114-115)
    */
  private def binary(left: DataFrame, right: DataFrame, keys: Seq[String],
                     keepNans: Boolean, typeLabel: Option[String])
                    (f: (Column, Column) => Column): DataFrame = {
    // merge right series sharing a group key: first-wins by series key order
    val rGrouped = right
      .withColumn("_mk", matchKey(keys))
      .withColumn("_sk", TsSchema.seriesKey(col(S.LabelsCol)))
      .groupBy(col("_mk"), col(S.Ts))
      .agg(expr(s"min_by(${S.Value}, _sk)").as("_rv"))
    val singleRight = rGrouped.select("_mk").distinct().count() == 1
    val l = left.withColumn("_mk", matchKey(keys))
    val joined =
      if (singleRight) {
        val r = rGrouped.select(col(S.Ts), col("_rv"))
        if (keepNans) l.join(r, Seq(S.Ts), "full_outer") else l.join(r, Seq(S.Ts), "inner")
      } else {
        val r = rGrouped.select(col("_mk"), col(S.Ts), col("_rv"))
        if (keepNans) l.join(r, Seq("_mk", S.Ts), "full_outer")
        else l.join(r, Seq("_mk", S.Ts), "inner")
      }
    val combined = joined
      .withColumn(S.Value, f(col(S.Value), col("_rv")))
      .drop("_mk", "_rv")
    typeLabel match {
      case Some(t) => combined
        .withColumn(S.LabelsCol,
          map_concat(col(S.LabelsCol), map(lit("type"), lit(t))))
        .withColumn(S.SeriesId, TsSchema.seriesId(col(S.LabelsCol)))
      case None => combined
    }
  }

  /** `divide <ref> [tags]` — 0 denominator and NaN operands yield NaN; output
    * tagged type:ratios (ref: DivideStage.java:114-127). */
  def divide(left: DataFrame, right: DataFrame, keys: Seq[String] = Nil,
             keepNans: Boolean = false): DataFrame =
    binary(left, right, keys, keepNans, Some("ratios"))((l, r) =>
      when(r === 0.0, lit(Double.NaN)).otherwise(l / r))

  /** `diff <ref>` — left minus right (ref: SubtractStage.java:28; no label
    * transform). */
  def diff(left: DataFrame, right: DataFrame, keys: Seq[String] = Nil,
           keepNans: Boolean = false): DataFrame =
    binary(left, right, keys, keepNans, None)((l, r) => l - r)

  /** `asPercent <ref> [tags]` — 100*left/right, tagged type:ratios
    * (ref: AsPercentStage.java:110-117). */
  def asPercent(left: DataFrame, right: DataFrame, keys: Seq[String] = Nil): DataFrame =
    binary(left, right, keys, keepNans = false, Some("ratios"))((l, r) =>
      when(r === 0.0, lit(Double.NaN)).otherwise(l * lit(100.0) / r))
}
