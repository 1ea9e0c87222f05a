package graft.serve

import graft.core.TsSchema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label-metadata surface — the discovery endpoints a dashboard client
  * (Grafana et al.) calls before it ever runs a query: label names, label
  * values, and the matching series list. The reference serves these from
  * its label index; here each is one distinct-aggregation over the samples
  * frame, so the same partition pruning / filter pushdown that protects
  * queries protects metadata too (a time-scoped request scans only its
  * partitions).
  *
  * Scale shape: explode of map keys is bounded by (rows × labels-per-row);
  * every endpoint ends in a hash distinct on a tiny projection — no full
  * label maps shuffle except for the series endpoint, whose output IS the
  * distinct label sets (dedup via groupBy on the canonical key — MAP
  * columns cannot be distinct()'d directly).
  */
object Metadata {
  private val S = TsSchema

  /** All label names present, sorted — `GET /api/v1/labels`. */
  def labelNames(samples: DataFrame): DataFrame =
    samples.select(explode(map_keys(col(S.LabelsCol))).as("label"))
      .distinct().orderBy("label")

  /** Distinct values of one label, sorted — `GET /api/v1/label/<k>/values`.
    * Series without the label don't contribute (no null row). */
  def labelValues(samples: DataFrame, key: String): DataFrame =
    samples.select(col(S.LabelsCol).getItem(key).as("value"))
      .where(col("value").isNotNull)
      .distinct().orderBy("value")

  /** Distinct matching series (canonical "k:v,k:v" key + label map) —
    * `GET /api/v1/series`. `matchers` are equality label filters. */
  def series(samples: DataFrame, matchers: Map[String, String]): DataFrame = {
    val filtered = matchers.foldLeft(samples) { case (df, (k, v)) =>
      df.where(col(S.LabelsCol).getItem(k) === v)
    }
    filtered
      .groupBy(S.seriesKey(col(S.LabelsCol)).as("series"))
      .agg(first(col(S.LabelsCol)).as(S.LabelsCol))
      .orderBy("series")
  }
}
