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

  /** Prometheus `stddev` aggregation — POPULATION stddev across the group's
    * series at each timestamp (Prometheus aggregates are population-based,
    * unlike M3's sample stddev). */
  def stddevPop(df: DataFrame, groupKeys: Seq[String] = Nil): DataFrame =
    run(df, groupKeys)(functions.stddev_pop)

  /** Prometheus `stdvar` aggregation — population variance per timestamp. */
  def varPop(df: DataFrame, groupKeys: Seq[String] = Nil): DataFrame =
    run(df, groupKeys)(functions.var_pop)

  /** Prometheus `group` aggregation — constant 1 for every group that has at
    * least one sample at the timestamp. */
  def groupConst(df: DataFrame, groupKeys: Seq[String] = Nil): DataFrame =
    run(df, groupKeys)(c => functions.count(c) * lit(0.0) + lit(1.0))

  /** Prometheus `count_values("label", v)` — per timestamp, count the series
    * having each distinct value; the stringified value becomes a new label.
    * The value renders like Go's strconv.FormatFloat(g): integral doubles
    * print without a decimal point. */
  def countValues(df: DataFrame, labelName: String, groupKeys: Seq[String] = Nil): DataFrame = {
    val (withKeys, gCols) = grouped(df, groupKeys)
    // integrality test BEFORE any long cast: ANSI mode throws on casting NaN
    // or out-of-range doubles, so the cast must be unreachable for them
    val v = col(TsSchema.Value)
    val integral = !isnan(v) && v >= -9.2e18 && v <= 9.2e18 && floor(v) === v
    val vStr = when(integral, v.cast("long").cast(StringType))
      .otherwise(v.cast(StringType))
    val agg = withKeys
      .withColumn("_vstr", vStr)
      .groupBy(gCols :+ col("_vstr"): _*)
      .agg(functions.count(lit(1)).cast(DoubleType).as(TsSchema.Value))
    // labels = retained group keys plus the stringified value under labelName
    agg.withColumn(TsSchema.LabelsCol, map_concat(
        if (groupKeys.isEmpty) map().cast(MapType(StringType, StringType, valueContainsNull = false))
        else map_filter(
          map(groupKeys.flatMap(k => Seq(lit(k), col(s"_g_$k"))): _*),
          (_, v) => v.isNotNull),
        map(lit(labelName), col("_vstr"))))
      .withColumn(TsSchema.SeriesId, TsSchema.seriesId(col(TsSchema.LabelsCol)))
      .select(TsSchema.SeriesId, TsSchema.LabelsCol, TsSchema.Ts, TsSchema.Value)
  }

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

  /** Whole-number percentiles print without the decimal point, fractional ones
    * with trailing zeros stripped (ref: PercentileUtils.formatPercentile,
    * query/utils/PercentileUtils.java:110-117). */
  private def fmtPercentile(p: Double): String =
    if (p == p.floor) p.toLong.toString
    else p.toString.replaceAll("\\.?0+$", "")

  /** M3-exact `percentileOfSeries p… [true|false] [tags]`: nearest-rank-lower —
    * rank = ceil(p/100 * n) (1-based, min 1), optional linear interpolation
    * toward the previous element (ref: PercentileUtils.calculatePercentile,
    * query/utils/PercentileUtils.java:37-75). One output series per requested
    * percentile — percentiles are deduped and sorted, and each series gains
    * `__percentile` = formatted p (ref: PercentileOfSeriesStage.java:62,
    * validateAndNormalizePercentiles). A single shuffle collects each group's
    * values once; the per-percentile projections explode from that buffer. */
  def percentileM3(df: DataFrame, ps: Seq[Double], groupKeys: Seq[String],
                   interpolate: Boolean): DataFrame = {
    require(ps.nonEmpty, "percentileOfSeries requires at least one percentile value")
    val sortedPs = ps.distinct.sorted
    val (withKeys, gCols) = grouped(df, groupKeys)
    val agged = withKeys.groupBy(gCols: _*)
      .agg(array_sort(collect_list(col(TsSchema.Value))).as("_vals"))
    def pVal(p: Double): Column = {
      val vals = col("_vals")
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
    val perP = array(sortedPs.map(p =>
      struct(lit(fmtPercentile(p)).as("_plabel"), pVal(p).as("_pv"))): _*)
    val exploded = agged
      .withColumn("_p", explode(perP))
      .withColumn(TsSchema.Value, col("_p").getField("_pv"))
    val groupLabels =
      if (groupKeys.isEmpty) map().cast(MapType(StringType, StringType, valueContainsNull = false))
      else map_filter(
        map(groupKeys.flatMap(k => Seq(lit(k), col(s"_g_$k"))): _*),
        (_, v) => v.isNotNull)
    exploded
      .withColumn(TsSchema.LabelsCol,
        map_concat(groupLabels, map(lit("__percentile"), col("_p").getField("_plabel"))))
      .withColumn(TsSchema.SeriesId, TsSchema.seriesId(col(TsSchema.LabelsCol)))
      .select(TsSchema.SeriesId, TsSchema.LabelsCol, TsSchema.Ts, TsSchema.Value)
  }

  /** Single-percentile convenience overload. */
  def percentileM3(df: DataFrame, p: Double, groupKeys: Seq[String] = Nil,
                   interpolate: Boolean = false): DataFrame =
    percentileM3(df, Seq(p), groupKeys, interpolate)

  /** Per-ts sample stddev via decimal-exact moments (ref: StdDevBucketSummarizer;
    * manual formula keeps Spark and a SQL oracle bit-identical). */
  def stddev(df: DataFrame, groupKeys: Seq[String] = Nil): DataFrame =
    run(df, groupKeys) { c =>
      val n = functions.count(c).cast(DoubleType)
      val s = OracleSafe.dSum(c)
      val s2 = OracleSafe.dSum(c * c)
      when(n > 1, sqrt((s2 - s * s / n) / (n - lit(1.0))))
    }

  /** Upper bound of a `bucket_range` label value, as pure builtin expressions
    * (ref: HistogramPercentileStage.BucketInfo.parseBucket:560-640):
    *  - "infinity" / "+Inf" whole-range → +∞ (upper of the catch-all bucket)
    *  - duration ranges "10ms-20ms" → upper in fractional milliseconds
    *  - value ranges "10-20", "-10--5", "1e-5-2e-5" (signed + scientific
    *    notation; the delimiter dash is found past a leading sign and never
    *    inside an exponent — ref findDelimiterDash:599-623)
    *  - "lo-infinity" / "lo-+Inf" → upper == lo (ref parseValueRange)
    *  - anything else raises, like the reference's IllegalArgumentException.
    */
  private def bucketUpperBound(br: Column): Column = {
    val delim = "^(-?.*?)(?<![eE])-(.*)$"
    val left = regexp_extract(br, delim, 1)
    val right = regexp_extract(br, delim, 2)
    val durRe = "^(-?\\d+(?:\\.\\d+)?)(ns|us|µs|ms|s|m|h)$"
    def durMs(s: Column): Column = {
      val v = regexp_extract(s, durRe, 1).cast(DoubleType)
      val u = regexp_extract(s, durRe, 2)
      val nanosFactor = when(u === "ns", lit(1.0))
        .when(u === "us" || u === "µs", lit(1000.0))
        .when(u === "ms", lit(1e6)).when(u === "s", lit(1e9))
        .when(u === "m", lit(6e10)).when(u === "h", lit(3.6e12))
      round(v * nanosFactor) / lit(1e6)
    }
    val leftVal = when(left === "-Inf" || left === "-infinity", lit(Double.NegativeInfinity))
      .otherwise(left.cast(DoubleType))
    val upper =
      when(br === "infinity" || br === "+Inf", lit(Double.PositiveInfinity))
        .when(left.rlike(durRe) && right.rlike(durRe), durMs(right))
        .when(right === "infinity" || right === "+Inf", leftVal)
        .otherwise(right.cast(DoubleType))
    when(upper.isNull, raise_error(concat(
      lit("Failed to parse bucket range '"), br,
      lit("' in histogram percentile calculation"))).cast(DoubleType))
      .otherwise(upper)
  }

  /** `histogramPercentile bucketIdKey bucketRangeKey p…` — regroup by all
    * labels EXCEPT the two bucket keys, then per timestamp pick the UPPER
    * BOUND of the first bucket (sorted by upper bound) whose cumulative count
    * reaches p/100 × total — no interpolation (ref:
    * HistogramPercentileStage.calculatePercentile:380-425). One output series
    * per requested percentile, labeled `histogramPercentile`=pXX (ref :354).
    * Timestamps whose buckets are all zero emit nothing (NaN-skip, :346-349);
    * a duplicate (bucketId, bucketRange) at one timestamp raises, matching the
    * reference's IllegalStateException (:322).
    *
    * Implemented with window functions over the bucket rows (no UDF): one
    * shuffle on (regrouped series, ts), then cumsum + first-bucket pick.
    */
  /** PromQL-style `histogram_quantile`: same bucket regroup as
    * histogramPercentile but with linear interpolation INSIDE the target
    * bucket (PromQL semantics — the M3 stage returns the bucket upper bound
    * instead). Kept for the PromQL frontend. */
  def histogramQuantile(df: DataFrame, p: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val S = TsSchema
    val bucketKeys = Seq("bucket_id", "bucket_range")
    val newLabels = map_filter(col(S.LabelsCol), (k, _) => !k.isInCollection(bucketKeys))
    val br = col(S.LabelsCol).getItem("bucket_range")
    // signed-aware bounds: the delimiter dash is found past a leading sign
    val delim = "^(-?.*?)(?<![eE])-(.*)$"
    val lo = regexp_extract(br, delim, 1).cast(DoubleType)
    val hi = regexp_extract(br, delim, 2).cast(DoubleType)
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

  def histogramPercentile(df: DataFrame, bucketIdKey: String, bucketRangeKey: String,
                          ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ps.nonEmpty, "histogramPercentile requires at least one percentile value")
    val sortedPs = ps.distinct.sorted
    val S = TsSchema
    val newLabels = map_filter(col(S.LabelsCol),
      (k, _) => k =!= bucketIdKey && k =!= bucketRangeKey)
    val base = df
      // series missing either bucket label are skipped (ref :289-292)
      .where(col(S.LabelsCol).getItem(bucketIdKey).isNotNull &&
             col(S.LabelsCol).getItem(bucketRangeKey).isNotNull)
      .withColumn("_bid", col(S.LabelsCol).getItem(bucketIdKey))
      .withColumn("_br", col(S.LabelsCol).getItem(bucketRangeKey))
      .withColumn("_upper", bucketUpperBound(col(S.LabelsCol).getItem(bucketRangeKey)))
      .withColumn(S.LabelsCol, newLabels)
      .withColumn(S.SeriesId, TsSchema.seriesId(col(S.LabelsCol)))
    val wDup = Window.partitionBy(S.SeriesId, S.Ts, "_bid", "_br")
    val w = Window.partitionBy(S.SeriesId, S.Ts).orderBy(col("_upper"), col("_bid"))
    val wAll = Window.partitionBy(S.SeriesId, S.Ts)
    val cum = base
      .withColumn(S.Value,
        when(functions.count(lit(1)).over(wDup) > 1,
          raise_error(concat(lit("already seen range"), col("_br"),
            lit(" Histogram buckets may have changed"))).cast(DoubleType))
          .otherwise(col(S.Value)))
      .withColumn("_cum", functions.sum(S.Value).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_total", functions.sum(S.Value).over(wAll))
    val perP = sortedPs.map { p =>
      val target = lit(p / 100.0) * col("_total")
      cum
        .where(col("_total") =!= 0 && col("_cum") >= target)
        .withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1)
        .withColumn(S.Value, col("_upper"))
        .withColumn(S.LabelsCol, map_concat(col(S.LabelsCol),
          map(lit("histogramPercentile"), lit("p" + fmtPercentile(p)))))
        .withColumn(S.SeriesId, TsSchema.seriesId(col(S.LabelsCol)))
        .select(col(S.SeriesId), col(S.LabelsCol), col(S.Ts), col(S.Value))
    }
    perP.reduce(_ unionByName _)
  }

  private def functions_min(c: Column): Column = functions.min(c)
  private def functions_max(c: Column): Column = functions.max(c)
  private val functions = org.apache.spark.sql.functions
}
