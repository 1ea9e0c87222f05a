package graft.lang.m3

import graft.core.QueryGrid
import graft.stages._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** M3QL → DataFrame compiler.
  *
  * Mirrors the reference's translate path (M3OSTranslator → plan →
  * SourceBuilderVisitor, lang/m3/dsl/M3OSTranslator.java:38-63) collapsed to a
  * single fold: the reference's shard/coordinator stage split, partial states
  * and buckets_path wiring all disappear into Catalyst. What is kept is the
  * plan-time **time-buffer arithmetic** (Context.timeBuffer/timeShift,
  * SourceBuilderVisitor.java:192-227): moving/perSecondRate widen the scan
  * range backwards, timeshift shifts it, and a final truncate clips back to
  * the query grid (TruncateStage injection, SourceBuilderVisitor.java:329-339).
  *
  * Macros become named DataFrames, cached when referenced more than once —
  * the reference's unfold-cache CSE (SourceBuilderVisitor.java:372-394).
  */
final class Compiler(spark: SparkSession, samples: DataFrame, grid: QueryGrid) {

  /** Parser-recognized but unimplemented in the reference — parity demands the
    * same failure (lang/m3/common/Constants.java:39-70). */
  private val unimplemented = Set(
    "aliasSub", "aliasByDistinctTags", "aliasByBucket", "aliasByHistogramBucket",
    "anomalies", "asBurnRate", "asMultiBurnRate", "burnRate", "burnRateMultiplier",
    "constantLine", "divideWhen", "histogramCDF", "jainCP", "mockFetchLine",
    "mockFetchLinear", "mockFetchPeriodic", "multiBurnRate", "nonNegativeDerivative",
    "nPercentile", "promHistogramPercentile", "removeAbovePercentile",
    "removeBelowPercentile", "setDiff", "showAnomalyThresholds", "stdev",
    "sustainedAbove")

  private var macroNames: Set[String] = Set.empty

  def compile(q: Query): DataFrame = {
    val macroDefs = q.macros.toMap
    macroNames = macroDefs.keySet
    // count references for cache decisions
    val refCounts = collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    def countRefs(p: Pipeline): Unit = {
      p.source match { case MacroSource(n) => refCounts(n) += 1; case _ => }
      p.stages.foreach(_.args.foreach {
        case RefArg(n) => refCounts(n) += 1
        case _         =>
      })
    }
    (q.macros.map(_._2) :+ q.main).foreach(countRefs)

    val compiled = collection.mutable.Map.empty[String, DataFrame]
    def macroDF(name: String): DataFrame =
      compiled.getOrElseUpdate(name, {
        val p = macroDefs.getOrElse(name,
          throw new IllegalArgumentException(s"undefined macro: $name"))
        val df = compilePipeline(p, macroDF)
        if (refCounts(name) > 1) df.cache() else df
      })

    compilePipeline(q.main, macroDF)
  }

  /** (extra scan lookback, accumulated timeshift) for a stage list
    * (ref: SourceBuilderVisitor.java:192-227,522-556,780-792). */
  private def buffers(stages: List[StageCall]): (Long, Long) =
    stages.foldLeft((0L, 0L)) { case ((buf, shift), st) =>
      st.name match {
        case "moving" | "movingAverage" | "movingMax" | "movingMedian" |
             "movingMin" | "movingSum" | "perSecondRate" =>
          val w = st.args.collectFirst { case DurArg(ms) => ms }.getOrElse(grid.stepMs)
          (buf + w, shift)
        case "timeshift" =>
          val s = st.args.collectFirst { case DurArg(ms) => ms }.getOrElse(0L)
          (buf, shift + s)
        case _ => (buf, shift)
      }
    }

  private def compilePipeline(p: Pipeline, macroDF: String => DataFrame,
                              extraBuf: Long = 0L, extraShift: Long = 0L,
                              clip: Boolean = true): DataFrame = {
    val (buf0, shift0) = buffers(p.stages)
    val buf = buf0 + extraBuf
    val shift = shift0 + extraShift
    val widened = QueryGrid(grid.startMs - buf - shift, grid.endMs - shift, grid.stepMs)
    val src = p.source match {
      case FetchSource(filters) =>
        // unfold rebucket: fetched samples are consolidated onto the query
        // step grid before stages run (ref: TimeSeriesUnfoldAggregator
        // consolidation via ConsolidationFunction — AVG default)
        Normalizer.resample(Fetch.fetch(samples, filters, widened), widened, "avg")
      case MockFetchSource(values, tags) =>
        Fetch.mockFetch(spark, widened, values, tags)
      case GroupSource(gp) =>
        compilePipeline(gp, macroDF, buf, shift, clip = false)
      case MacroSource(n) => macroDF(n)
    }
    // stages run against the WIDENED grid; a union-group at position k inherits
    // the buffers of the stages AFTER it (its branch feeds the same tail); the
    // final truncate clips back (ref: SourceBuilderVisitor.java:329-339)
    val out = p.stages.zipWithIndex.foldLeft(src) {
      case (df, (StageCall("__group", List(PipeArg(inner))), k)) =>
        val (sb, ss) = buffers(p.stages.drop(k + 1))
        val branch = compilePipeline(inner, macroDF, sb + extraBuf, ss + extraShift,
          clip = false)
        SeriesSet.union(Seq(df, branch))
      case (df, (st, _)) => applyStage(df, st, widened, macroDF)
    }
    if (clip && (buf > 0 || shift > 0)) Temporal.truncate(out, grid) else out
  }

  private def str(a: Arg): String = a match {
    case StrArg(s) => s
    case NumArg(v) => if (v == v.floor) v.toLong.toString else v.toString
    case DurArg(m) => m.toString
    case RefArg(n) => n
  }
  private def strings(args: List[Arg]): Seq[String] = args.map(str)

  private def applyStage(df: DataFrame, st: StageCall, g: QueryGrid,
                         macroDF: String => DataFrame): DataFrame = {
    def num(i: Int, dflt: Double = Double.NaN): Double =
      st.args.lift(i) match {
        case Some(NumArg(v)) => v
        case Some(DurArg(m)) => m.toDouble
        case Some(StrArg(s)) => s.toDouble
        case _ if !dflt.isNaN => dflt
        case _ => throw new IllegalArgumentException(s"${st.name}: missing numeric arg $i")
      }
    def dur(i: Int, dflt: Long = -1L): Long =
      st.args.lift(i) match {
        case Some(DurArg(m)) => m
        case Some(NumArg(v)) => v.toLong
        case _ if dflt >= 0  => dflt
        case _ => throw new IllegalArgumentException(s"${st.name}: missing duration arg $i")
      }
    def ref: DataFrame = st.args.collectFirst {
        case RefArg(n)  => macroDF(n)
        case PipeArg(p) => compilePipeline(p, macroDF)
      }
      .getOrElse(throw new IllegalArgumentException(s"${st.name}: missing pipeline ref"))
    def tagArgs(from: Int): Seq[String] =
      strings(st.args.drop(from)).filterNot(_.isEmpty)
    def groupTags: Seq[String] = st.args.collect { case StrArg(s) => s }

    st.name match {
      // grouping aggregations
      case "sum" | "sumSeries"              => Grouping.sum(df, groupTags)
      case "avg" | "average" | "averageSeries" => Grouping.avg(df, groupTags)
      case "min" | "minimum" | "minSeries"  => Grouping.min(df, groupTags)
      case "max" | "maximum" | "maxSeries"  => Grouping.max(df, groupTags)
      case "count" | "countSeries"          => Grouping.count(df, g, groupTags)
      case "multiply" | "multiplySeries"    => Grouping.multiplyExact(df, groupTags)
      case "range" | "rangeOfSeries"        => Grouping.range(df, groupTags)
      case "median" | "medianOfSeries"      => Grouping.percentileM3(df, 50.0, groupTags)
      case "percentileOfSeries" | "percentile_of_series" =>
        val rest = st.args.drop(1).collect { case StrArg(s) => s }
        val interpolate = rest.contains("true")
        Grouping.percentileM3(df, num(0),
          rest.filterNot(t => t == "true" || t == "false"), interpolate)
      case "histogramPercentile" =>
        Grouping.histogramPercentile(df, num(0) / 100.0)

      // mappers
      case "abs" | "absolute"      => Mappers.absStage(df)
      case "logarithm" | "log"     => Mappers.logarithm(df)
      case "sqrt" | "squareRoot"   => Mappers.sqrtStage(df)
      case "round"                 => Mappers.roundStage(df, num(0, 0).toInt)
      case "scale"                 => Mappers.scale(df, num(0))
      case "divideScalar"          => Mappers.divideScalar(df, num(0))
      case "offset"                => Mappers.offsetStage(df, num(0))
      case "scaleToSeconds"        => Mappers.scaleToSeconds(df, g, num(0))

      // temporal
      case "derivative"     => Temporal.derivative(df, g)
      case "perSecond"      => Temporal.perSecond(df)
      case "perSecondRate"  => Temporal.perSecondRate(df, dur(0, g.stepMs * 10))
      case "integral"       => Temporal.integral(df, g,
        st.args.headOption.exists(a => str(a) == "true"))
      case "changed"        => Temporal.changed(df, g)
      case "timeshift"      =>
        if (st.args.length != 1)
          throw new IllegalArgumentException("Timeshift function expects exactly one argument")
        Temporal.timeshift(df, dur(0))
      case "moving"         => Temporal.moving(df, g, dur(0), str(st.args(1)))
      case "movingAverage"  => Temporal.moving(df, g, dur(0), "avg")
      case "movingSum"      => Temporal.moving(df, g, dur(0), "sum")
      case "movingMin"      => Temporal.moving(df, g, dur(0), "min")
      case "movingMax"      => Temporal.moving(df, g, dur(0), "max")
      case "movingMedian"   => Temporal.moving(df, g, dur(0), "median")
      case "keepLastValue"  => Temporal.keepLastValue(df, g,
        st.args.headOption.map(a => dur(0)))
      case "sustain"        => Temporal.sustain(df, g, dur(0))
      case "summarize"      => Temporal.summarize(df, dur(0),
        if (st.args.length > 1) str(st.args(1)) else "avg",
        if (st.args.length > 2 && str(st.args(2)) == "true") g.startMs else 0L)

      // grid / null semantics
      case "transformNull"  => GridOps.transformNull(df, g, num(0, 0.0))
      case "isNonNull"      => GridOps.isNonNull(df, g)
      case "removeEmpty"    => GridOps.removeEmpty(df)
      case "fallbackSeries" =>
        st.args.collectFirst {
          case RefArg(n)  => () => macroDF(n)
          case PipeArg(p) => () => compilePipeline(p, macroDF)
        } match {
          case Some(mk) => GridOps.fallbackSeriesBinary(df, mk())
          case None     => GridOps.fallbackSeries(spark, df, g, num(0))
        }

      // filters
      case "valueFilter"      =>
        val op = str(st.args(0)) match {
          case "eq" => "=="; case "ne" => "!="; case "ge" => ">="
          case "gt" => ">"; case "le" => "<="; case "lt" => "<"
          case sym  => sym
        }
        Filters.valueFilter(df, op, num(1))
      case "removeBelowValue" => Filters.valueFilter(df, ">=", num(0))
      case "removeAboveValue" => Filters.valueFilter(df, "<=", num(0))
      // word-form value-filter stages: `| eq 12`
      // (ref: Constants.Functions.ValueFilter, M3PlanNodeFactory value-filter cases)
      case "eq" => Filters.valueFilter(df, "==", num(0))
      case "ne" => Filters.valueFilter(df, "!=", num(0))
      case "ge" => Filters.valueFilter(df, ">=", num(0))
      case "gt" => Filters.valueFilter(df, ">", num(0))
      case "le" => Filters.valueFilter(df, "<=", num(0))
      case "lt" => Filters.valueFilter(df, "<", num(0))
      case "excludeByTag"     => Filters.excludeByTag(df, str(st.args(0)), tagArgs(1))
      case "tagCompare"       =>
        if (st.args.length == 2) {
          // combined form: tagCompare "<=" "key:value"
          val kv = str(st.args(1))
          val i = kv.indexOf(':')
          Filters.tagCompare(df, str(st.args(0)), kv.substring(0, i), kv.substring(i + 1))
        } else Filters.tagCompare(df, str(st.args(0)), str(st.args(1)), str(st.args(2)))
      case "where"            => Filters.whereTags(df, str(st.args(0)), str(st.args(1)), str(st.args(2)))
      case "intersect"        => Filters.intersect(df, ref,
        st.args.collect { case StrArg(s) => s })

      // label ops
      case "alias"       => LabelOps.alias(df, str(st.args(0)))
      case "aliasByTags" => LabelOps.aliasByTags(df, groupTags)
      case "showTags"    =>
        val inc = st.args.headOption.forall(a => str(a) != "false")
        LabelOps.showTags(df, inc, tagArgs(1))
      case "mapKey"      => LabelOps.mapKey(df, str(st.args(0)), str(st.args(1)))
      case "tagSub"      => LabelOps.tagSub(df, str(st.args(0)), str(st.args(1)), str(st.args(2)))

      // series-set ops
      case "sort" | "sortSeries" =>
        val by = st.args.headOption.map(str).getOrElse("avg")
        val desc = st.args.lift(1).forall(a => str(a) != "asc")
        SeriesSet.sortSeries(df, by, desc)
      case "head" => SeriesSet.slice(df, num(0, 10).toInt)
      case "tail" => SeriesSet.slice(df, num(0, 10).toInt, tail = true)
      case "topK" =>
        val k = num(0, 10).toInt
        val by = st.args.lift(1).map(str).getOrElse("current")
        val desc = st.args.lift(2).forall(a => str(a) != "asc")
        SeriesSet.topK(df, k, by, desc)
      case "union"     => SeriesSet.union(Seq(df, ref))
      case "divide"    => SeriesSet.divide(df, ref, st.args.collect { case StrArg(s) => s })
      case "diff" | "subtract" =>
        SeriesSet.diff(df, ref, st.args.collect { case StrArg(s) => s })
      case "asPercent" | "ratio" =>
        SeriesSet.asPercent(df, ref, st.args.collect { case StrArg(s) => s })

      case n if unimplemented(n) =>
        throw new UnsupportedOperationException(s"M3QL function not implemented: $n")
      case n if macroNames(n) && st.args.isEmpty =>
        // bare macro reference in pipe position unions its series in
        SeriesSet.union(Seq(df, macroDF(n)))
      case other =>
        throw new IllegalArgumentException(s"unknown M3QL stage: $other")
    }
  }
}

object M3QL {
  /** Parse + compile an M3QL query over a canonical samples DataFrame. */
  def query(spark: SparkSession, samples: DataFrame, grid: QueryGrid, q: String): DataFrame =
    new Compiler(spark, samples, grid).compile(Parser.parse(q))
}
