package graft.serve

import graft.core.TsSchema
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The `/_tsdb/stats` surface (ref: query/rest/RestTSDBStatsAction.java:76-146)
  * re-expressed over a canonical samples DataFrame: cardinality statistics of
  * the series selected by a fetch, computed distributedly — one shuffle on
  * series identity, one on exploded (label, value) pairs. The Lucene-specific
  * `chunkCount`/memory numbers have no Spark analogue and are omitted; the
  * render methods (grouped/flat) collect only the aggregated statistics, the
  * sanctioned response-path pattern (like serve.Matrix).
  */
object TsdbStats {
  private val S = TsSchema

  /** One row per selected series: (series_id, labels) — the unit every stat
    * counts. MAP columns can't be distinct()ed, so dedup via groupBy. */
  def seriesOf(samples: DataFrame): DataFrame =
    samples.groupBy(col(S.SeriesId)).agg(first(col(S.LabelsCol)).as(S.LabelsCol))

  /** headStats: numSeries + time extent of the selection
    * (ref grouped response: numSeries/minTime/maxTime). */
  def headStats(samples: DataFrame): DataFrame =
    samples.agg(
      count_distinct(col(S.SeriesId)).as("num_series"),
      count(lit(1)).as("sample_count"),
      min(col(S.Ts)).as("min_time"),
      max(col(S.Ts)).as("max_time"))

  /** (label, value) → series count — the seriesCountByLabelValuePair /
    * per-label valuesStats building block. */
  def seriesCountByLabelValuePair(samples: DataFrame): DataFrame =
    seriesOf(samples)
      .select(explode(col(S.LabelsCol)).as(Seq("label", "value")))
      .groupBy("label", "value")
      .agg(count(lit(1)).as("num_series"))

  /** label → distinct value count (flat labelValueCountByLabelName). */
  def labelValueCountByLabelName(samples: DataFrame): DataFrame =
    seriesCountByLabelValuePair(samples)
      .groupBy("label")
      .agg(count(lit(1)).as("num_values"), sum("num_series").as("num_series"))

  /** metric name → series count (flat seriesCountByMetricName; the reference's
    * metric name is the `name` label). */
  def seriesCountByMetricName(samples: DataFrame): DataFrame =
    seriesCountByLabelValuePair(samples)
      .where(col("label") === "name")
      .select(col("value").as("name"), col("num_series"))

  import JsonEsc.esc

  /** Grouped-format JSON (ref response example :84-108): headStats plus, per
    * label name, value cardinality and (optionally) per-value series counts. */
  def renderGrouped(samples: DataFrame, includeValueStats: Boolean = true): String = {
    val h = headStats(samples).collect()(0)
    val pairs = seriesCountByLabelValuePair(samples)
      .orderBy(col("label"), col("num_series").desc, col("value")).collect()
    val byLabel = pairs.groupBy((r: Row) => r.getString(0)).toSeq.sortBy(_._1)
    val labels = byLabel.map { case (label, rows) =>
      val values = rows.map(r => "\"" + esc(r.getString(1)) + "\"").mkString("[", ",", "]")
      val vs =
        if (!includeValueStats) ""
        else rows.map(r => "\"" + esc(r.getString(1)) + "\":" + r.getLong(2))
          .mkString(",\"valuesStats\":{", ",", "}")
      val numSeries = rows.map(_.getLong(2)).sum
      s""""${esc(label)}":{"numSeries":$numSeries,"values":$values$vs}"""
    }
    val head =
      s""""headStats":{"numSeries":${h.getLong(0)},"sampleCount":${h.getLong(1)},""" +
        s""""minTime":${if (h.isNullAt(2)) 0L else h.getLong(2)},""" +
        s""""maxTime":${if (h.isNullAt(3)) 0L else h.getLong(3)}}"""
    (Seq(head, s""""labelStats":{${labels.mkString(",")}}""")).mkString("{", ",", "}")
  }

  /** [[renderGrouped]] plus the `ingestionLag` section for one ingest
    * source — the reference exposes its lag histograms through the same
    * stats/metrics surface (metrics/TSDBIngestionLagMetrics.java), so the
    * grouped stats response carries the per-source lag summary here. */
  def renderGroupedWithLag(samples: DataFrame, source: String,
                           includeValueStats: Boolean = true): String = {
    val grouped = renderGrouped(samples, includeValueStats)
    grouped.dropRight(1) + s""","ingestionLag":${IngestLag.render(source)}}"""
  }

  /** Flat (Prometheus-style) format (ref response example :113-145). All three
    * arrays derive from ONE collected (label, value, num_series) aggregate —
    * a single pass over the input, like renderGrouped. */
  def renderFlat(samples: DataFrame, includeValueStats: Boolean = true): String = {
    val h = headStats(samples).collect()(0)
    val pairs = seriesCountByLabelValuePair(samples).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def arr(items: Seq[(String, Long)]): String =
      items.sortBy { case (n, v) => (-v, n) }
        .map { case (n, v) => s"""{"name":"${esc(n)}","value":$v}""" }
        .mkString("[", ",", "]")
    val byMetric = arr(pairs.toSeq.collect { case ("name", v, n) => (v, n) })
    val byLabelName = arr(pairs.groupBy(_._1).view
      .map { case (label, rs) => (label, rs.length.toLong) }.toSeq)
    val byPair = arr(pairs.toSeq.map { case (l, v, n) => (s"$l=$v", n) })
    val head =
      s""""headStats":{"numSeries":${h.getLong(0)},"sampleCount":${h.getLong(1)},""" +
        s""""minTime":${if (h.isNullAt(2)) 0L else h.getLong(2)},""" +
        s""""maxTime":${if (h.isNullAt(3)) 0L else h.getLong(3)}}"""
    val parts = Seq(
      head,
      s""""seriesCountByMetricName":$byMetric""",
      s""""labelValueCountByLabelName":$byLabelName""") ++
      (if (includeValueStats) Seq(s""""seriesCountByLabelValuePair":$byPair""") else Nil)
    parts.mkString("{", ",", "}")
  }

  /** [[renderFlat]] plus the `ingestionLag` section — the flat-format
    * counterpart of [[renderGroupedWithLag]]. */
  def renderFlatWithLag(samples: DataFrame, source: String,
                        includeValueStats: Boolean = true): String = {
    val flat = renderFlat(samples, includeValueStats)
    flat.dropRight(1) + s""","ingestionLag":${IngestLag.render(source)}}"""
  }
}
