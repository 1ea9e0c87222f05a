package graft.stages

import graft.core.{OracleSafe, TsSchema}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-series grouping aggregations: per-timestamp aggregate over all series
  * in a group, where the group is the projection of the label set onto
  * `groupKeys` (empty = all series into one).
  *
  * Reference: AbstractGroupingStage (lang/m3/stage/AbstractGroupingStage.java:37-42)
  * with partial/final state merging (:133-167). In Spark the shard-partial +
  * coordinator-final split is exactly Catalyst's partial aggregation — e.g. the
  * reference's SumCountSample (core/model/SumCountSample.java:24-95) IS the
  * builtin `avg` buffer — so each stage is a plain groupBy().agg().
  */
object Grouping {

  /** groupBy columns for (groupKeys, timestamp); missing labels group as null,
    * and the output label set keeps only the retained, present keys
    * (ref: AbstractGroupingStage group-key = values of groupByLabels). */
  private def grouped(df: DataFrame, groupKeys: Seq[String]): (DataFrame, Seq[Column]) = {
    val keyCols = groupKeys.map(k => col(TsSchema.LabelsCol).getItem(k).as(s"_g_$k"))
    // series missing any groupBy label are excluded (golden corpus: sum by a
    // non-existent tag yields an empty result)
    val withKeys = df.select(col("*") +: keyCols: _*)
      .where(groupKeys.map(k => col(s"_g_$k").isNotNull).foldLeft(lit(true))(_ && _))
    (withKeys, groupKeys.map(k => col(s"_g_$k")) :+ col(TsSchema.Ts))
  }

  /** Rebuild canonical output columns (labels map of retained keys, series_id). */
  private def finish(df: DataFrame, groupKeys: Seq[String]): DataFrame = {
    val labelExpr =
      if (groupKeys.isEmpty) map().cast(MapType(StringType, StringType, valueContainsNull = false))
      else map_filter(
        map(groupKeys.flatMap(k => Seq(lit(k), col(s"_g_$k"))): _*),
        (_, v) => v.isNotNull)
    val out = df.withColumn(TsSchema.LabelsCol, labelExpr)
      .withColumn(TsSchema.SeriesId, TsSchema.seriesId(col(TsSchema.LabelsCol)))
    out.select(TsSchema.SeriesId, TsSchema.LabelsCol, TsSchema.Ts, TsSchema.Value)
  }

  private def run(df: DataFrame, groupKeys: Seq[String])(aggFn: Column => Column): DataFrame = {
    val (withKeys, gCols) = grouped(df, groupKeys)
    finish(
      withKeys.groupBy(gCols: _*).agg(aggFn(col(TsSchema.Value)).as(TsSchema.Value)),
      groupKeys)
  }

  /** `sum [tags]` (ref: SumStage.java:20-61). Decimal-exact for oracle parity. */
  def sum(df: DataFrame, groupKeys: Seq[String] = Nil): DataFrame =
    run(df, groupKeys)(OracleSafe.dSum)

  /** `avg` (ref: AvgStage.java:61,92-115 — SumCount partial state). */
  def avg(df: DataFrame, groupKeys: Seq[String] = Nil): DataFrame =
    run(df, groupKeys)(OracleSafe.dAvg)

  /** `min` (ref: MinStage.java:20-41). */
  def min(df: DataFrame, groupKeys: Seq[String] = Nil): DataFrame =
    run(df, groupKeys)(functions_min)

  /** `max` (ref: MaxStage.java:20-41). */
  def max(df: DataFrame, groupKeys: Seq[String] = Nil): DataFrame =
    run(df, groupKeys)(functions_max)

  /** `count` — the number of SERIES in each group, emitted as a dense constant
    * series over the whole query grid (ref: CountStage.processGroup /
    * buildDenseSamples — the count is series cardinality, not per-timestamp
    * sample presence; CountStage.java:96-111,165-175). */
  def count(df: DataFrame, grid: graft.core.QueryGrid,
            groupKeys: Seq[String] = Nil): DataFrame = {
    val keyCols = groupKeys.map(k => col(TsSchema.LabelsCol).getItem(k).as(s"_g_$k"))
    val withKeys = df.select(col(TsSchema.SeriesId) +: keyCols: _*)
      .where(groupKeys.map(k => col(s"_g_$k").isNotNull).foldLeft(lit(true))(_ && _))
    val counts = withKeys
      .groupBy(groupKeys.map(k => col(s"_g_$k")): _*)
      .agg(functions.count_distinct(col(TsSchema.SeriesId)).cast(DoubleType).as(TsSchema.Value))
    val dense = counts.select(
      col("*"),
      explode(sequence(lit(grid.startMs), lit(grid.alignedEndMs), lit(grid.stepMs)))
        .as(TsSchema.Ts))
    finish(dense, groupKeys)
  }

  /** Per-timestamp count of series with data — the Spark-natural variant kept
    * for pipelines that want presence counts rather than cardinality. */
  def countAtTimestamp(df: DataFrame, groupKeys: Seq[String] = Nil): DataFrame =
    run(df, groupKeys)(c => functions.count(c).cast(DoubleType))

  /** `range` — per-ts max-min, MinMax partial state (ref: RangeStage.java:22-45). */
  def range(df: DataFrame, groupKeys: Seq[String] = Nil): DataFrame =
    run(df, groupKeys)(c => functions_max(c) - functions_min(c))

  /** `multiply` — per-ts product (ref: MultiplyStage.java:20-41). No Spark
    * builtin product; exact over integer-valued doubles while partial products
    * stay < 2^53 (each FP multiply of exact integers is exact). */
  def multiply(df: DataFrame, groupKeys: Seq[String] = Nil): DataFrame =
    run(df, groupKeys)(c => exp(functions.sum(log(functions.abs(c)))) *
      when(functions.sum(when(c === 0, 1).otherwise(0)) > 0, lit(0.0))
        .otherwise(pow(lit(-1.0), functions.sum(when(c < 0, 1).otherwise(0)))))

  /** Exact product via Aggregator (preferred; see functions.ProductAgg). */
  def multiplyExact(df: DataFrame, groupKeys: Seq[String] = Nil): DataFrame =
    run(df, groupKeys)(graft.functions.Product.product)

  /** `percentile_of_series p [tags]` / `median` — exact per-ts percentile across
    * the group's series (ref: PercentileOfSeriesStage.java:38-66, MultiValue
    * partial state merged then sorted — exactly Spark's exact `percentile`). */
  def percentileOfSeries(df: DataFrame, p: Double, groupKeys: Seq[String] = Nil): DataFrame =
    run(df, groupKeys)(c => percentile_approx(c, lit(p), lit(1000000)))

  /** Exact percentile with linear interpolation (Spark `percentile` semantics,
    * pos = p*(n-1) — used by the SQL-oracle demo queries). */
  def percentileExact(df: DataFrame, p: Double, groupKeys: Seq[String] = Nil): DataFrame =
    run(df, groupKeys)(c => expr(s"percentile(${TsSchema.Value}, $p)"))

  /** M3-exact `percentileOfSeries p [tags]`: nearest-rank-lower —
    * rank = ceil(p/100 * n) (1-based, min 1), optional linear interpolation
    * toward the previous element (ref: PercentileUtils.calculatePercentile,
    * query/utils/PercentileUtils.java:37-75). Output label set gains
    * `__percentile` = formatted p (ref: PercentileOfSeriesStage.java:78). */
  def percentileM3(df: DataFrame, p: Double, groupKeys: Seq[String] = Nil,
                   interpolate: Boolean = false): DataFrame = {
    val out = run(df, groupKeys) { c =>
      val vals = array_sort(collect_list(c))
      val n = size(vals)
      val fr = lit(p / 100.0) * n
      val rank = greatest(ceil(fr).cast(IntegerType), lit(1))
      val atRank = element_at(vals, rank)
      if (!interpolate) atRank
      else {
        val prev = element_at(vals, greatest(rank - 1, lit(1)))
        val fraction = fr - (rank.cast(DoubleType) - 1.0)
        when(rank >= 2, prev + fraction * (atRank - prev)).otherwise(atRank)
      }
    }
    val pLabel = if (p == p.floor) p.toLong.toString else p.toString
    out
      .withColumn(TsSchema.LabelsCol,
        map_concat(col(TsSchema.LabelsCol), map(lit("__percentile"), lit(pLabel))))
      .withColumn(TsSchema.SeriesId, TsSchema.seriesId(col(TsSchema.LabelsCol)))
  }

  /** Per-ts sample stddev via decimal-exact moments (ref: StdDevBucketSummarizer;
    * manual formula keeps Spark and a SQL oracle bit-identical). */
  def stddev(df: DataFrame, groupKeys: Seq[String] = Nil): DataFrame =
    run(df, groupKeys) { c =>
      val n = functions.count(c).cast(DoubleType)
      val s = OracleSafe.dSum(c)
      val s2 = OracleSafe.dSum(c * c)
      when(n > 1, sqrt((s2 - s * s / n) / (n - lit(1.0))))
    }

  /** `histogramPercentile p` — regroup by all labels EXCEPT the bucket keys,
    * then per timestamp compute the percentile from cumulative bucket counts
    * with linear interpolation inside the target bucket — the same math as
    * PromQL histogram_quantile (ref: HistogramPercentileStage.java:41-70;
    * BUCKET_ID :54, BUCKET_RANGE :57 — bucket_range = "lo-hi").
    *
    * Implemented with window functions over the bucket rows (no UDF): one
    * shuffle on (regrouped series, ts), then cumsum + first-bucket pick.
    */
  def histogramPercentile(df: DataFrame, p: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val S = TsSchema
    val bucketKeys = Seq("bucket_id", "bucket_range")
    val newLabels = map_filter(col(S.LabelsCol), (k, _) => !k.isInCollection(bucketKeys))
    val lo = split(col(S.LabelsCol).getItem("bucket_range"), "-").getItem(0).cast(DoubleType)
    val hi = split(col(S.LabelsCol).getItem("bucket_range"), "-").getItem(1).cast(DoubleType)
    val base = df
      .withColumn("_lo", lo).withColumn("_hi", hi)
      .withColumn(S.LabelsCol, newLabels)
      .withColumn(S.SeriesId, TsSchema.seriesId(col(S.LabelsCol)))
    val w = Window.partitionBy(S.SeriesId, S.Ts).orderBy("_hi")
    val wAll = Window.partitionBy(S.SeriesId, S.Ts)
    val cum = base
      .withColumn("_cum", functions.sum(S.Value).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_total", functions.sum(S.Value).over(wAll))
      .withColumn("_target", lit(p) * col("_total"))
    val hit = cum
      .where(col("_cum") >= col("_target"))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
    hit
      .withColumn(S.Value,
        when(col("_total") === 0, lit(Double.NaN)).otherwise(
          col("_lo") + (col("_hi") - col("_lo")) *
            (col("_target") - (col("_cum") - col(S.Value))) / col(S.Value)))
      .select(col(S.SeriesId), col(S.LabelsCol), col(S.Ts), col(S.Value))
  }

  private def functions_min(c: Column): Column = functions.min(c)
  private def functions_max(c: Column): Column = functions.max(c)
  private val functions = org.apache.spark.sql.functions
}
