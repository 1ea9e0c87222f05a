package graft.stages

import graft.core.{QueryGrid, TsSchema}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `fetch k:v k2:v2 …` — the scan stage: select series whose labels match ALL
  * filters, ANDed with the query time range.
  *
  * Reference semantics (grammar lang/m3/m3ql/parser/m3ql.jj:221; query build
  * lang/m3/dsl/SourceBuilderVisitor.java:911-1000): values support `*`/`?`
  * wildcards, `!` prefix negation, and multi-value `(a,b,c)`; the time-range
  * filter goes first (ref :922 — range on timestamp_range).
  *
  * Spark: each filter is a Column predicate on the labels map → Catalyst pushes
  * the conjunction into the parquet scan; time-range on a partition column
  * prunes partitions (replaces the reference's TimeRangePruningQuery).
  */
object Fetch {

  /** One label filter. Value syntax: `a`, `a*b?`, `!a`, `(a,b,c)`, `!(a,b)`. */
  final case class LabelFilter(key: String, rawValue: String) {
    val negated: Boolean = rawValue.startsWith("!")
    private val v = if (negated) rawValue.substring(1) else rawValue
    val values: Seq[String] =
      if (v.startsWith("(") && v.endsWith(")")) v.substring(1, v.length - 1).split(",").toSeq.map(_.trim)
      else Seq(v)

    private def one(tag: Column, value: String): Column =
      if (value.contains("*") || value.contains("?")) {
        // glob → anchored regex: escape everything, then translate \* and \?
        val rx = java.util.regex.Pattern.quote(value)
          .replace("*", "\\E.*\\Q").replace("?", "\\E.\\Q")
        tag.rlike(s"^$rx$$")
      } else tag === value

    def predicate: Column = {
      val tag = col(TsSchema.LabelsCol).getItem(key)
      val anyMatch = values.map(one(tag, _)).reduce(_ || _)
      if (negated) tag.isNotNull && !anyMatch else anyMatch
    }
  }

  /** Apply fetch filters + grid time range (end-exclusive) to a samples DF. */
  def fetch(samples: DataFrame, filters: Seq[LabelFilter], grid: QueryGrid): DataFrame = {
    val timePred = col(TsSchema.Ts) >= grid.startMs && col(TsSchema.Ts) < grid.endMs
    filters.foldLeft(samples.where(timePred))((df, f) => df.where(f.predicate))
  }

  /** `mockFetch [values] [tags]` — synthesize constant series over the query
    * grid without touching storage (test/alerting source; ref:
    * lang/m3/stage/MockFetchStage.java:29-38 — MatchNoneQueryBuilder + literal
    * series at the coordinator). One series per (value, tagset). */
  def mockFetch(spark: org.apache.spark.sql.SparkSession, grid: QueryGrid,
                series: Seq[(Double, Map[String, String])]): DataFrame = {
    import org.apache.spark.sql.types._
    val dfs = series.map { case (v, tags) =>
      val labelCol = map(tags.toSeq.sortBy(_._1)
        .flatMap { case (k, x) => Seq(lit(k), lit(x)) }: _*)
        .cast(MapType(StringType, StringType, valueContainsNull = false))
      grid.gridDF(spark).select(
        TsSchema.seriesId(labelCol).as(TsSchema.SeriesId),
        labelCol.as(TsSchema.LabelsCol),
        col(TsSchema.Ts),
        lit(v).as(TsSchema.Value))
    }
    dfs.reduce(_ unionByName _)
  }

  /** Parse `"k:v k2:v2"` filter text (the fetch argument list). */
  def parseFilters(text: String): Seq[LabelFilter] =
    text.trim.split("\\s+").filter(_.nonEmpty).toSeq.map { tok =>
      val i = tok.indexOf(':')
      require(i > 0, s"bad fetch filter: $tok")
      LabelFilter(tok.substring(0, i), tok.substring(i + 1))
    }
}
