package graft.lang.m3

import graft.core.{QueryGrid, StepMeta}
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
  * Each pipeline also carries compile-time StepMeta (step + bucket origin) —
  * the step only changes at `summarize` — so binary projections can
  * step-normalize mismatched operands exactly where the reference runs
  * TimeSeriesNormalizer (AbstractBinaryProjectionStage PAIRWISE/BATCH; diff
  * is NormalizationStrategy.NONE and is left unnormalized).
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

    val compiled = collection.mutable.Map.empty[String, (DataFrame, StepMeta)]
    def macroDF(name: String): (DataFrame, StepMeta) =
      compiled.getOrElseUpdate(name, {
        val p = macroDefs.getOrElse(name,
          throw new IllegalArgumentException(s"undefined macro: $name"))
        val (df, meta) = compilePipeline(p, macroDF)
        (if (refCounts(name) > 1) df.cache() else df, meta)
      })

    compilePipeline(q.main, macroDF)._1
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

  private def compilePipeline(p: Pipeline, macroDF: String => (DataFrame, StepMeta),
                              extraBuf: Long = 0L, extraShift: Long = 0L,
                              clip: Boolean = true): (DataFrame, StepMeta) = {
    val (buf0, shift0) = buffers(p.stages)
    val buf = buf0 + extraBuf
    val shift = shift0 + extraShift
    val widened = QueryGrid(grid.startMs - buf - shift, grid.endMs - shift, grid.stepMs)
    val (src, srcMeta) = p.source match {
      case FetchSource(filters) =>
        // unfold rebucket: fetched samples are floor-aligned onto the query
        // step grid keeping the LATEST sample per aligned timestamp —
        // last-wins, not an average (ref: TimeSeriesUnfoldAggregator
        // :305-320 "only keep the latest sample for each aligned timestamp";
        // validated by m3ql_step_size_from_index_settings_rest_it.yaml)
        (Normalizer.resample(Fetch.fetch(samples, filters, widened), widened, "last",
          skipNaN = false),
          StepMeta(grid.stepMs, widened.startMs))
      case MockFetchSource(values, tags) =>
        (Fetch.mockFetch(spark, widened, values, tags),
          StepMeta(grid.stepMs, widened.startMs))
      case GroupSource(gp) =>
        compilePipeline(gp, macroDF, buf, shift, clip = false)
      case MacroSource(n) => macroDF(n)
    }
    // stages run against the WIDENED grid; a union-group at position k inherits
    // the buffers of the stages AFTER it (its branch feeds the same tail); the
    // final truncate clips back (ref: SourceBuilderVisitor.java:329-339)
    val (out, outMeta) = p.stages.zipWithIndex.foldLeft((src, srcMeta)) {
      case ((df, meta), (StageCall("__group", List(PipeArg(inner))), k)) =>
        val (sb, ss) = buffers(p.stages.drop(k + 1))
        val (branch, _) = compilePipeline(inner, macroDF, sb + extraBuf, ss + extraShift,
          clip = false)
        (SeriesSet.union(Seq(df, branch)), meta)
      case ((df, meta), (st, _)) => applyStage(df, meta, st, widened, macroDF)
    }
    (if (clip && (buf > 0 || shift > 0)) Temporal.truncate(out, grid) else out, outMeta)
  }

  private def str(a: Arg): String = a match {
    case StrArg(s) => s
    case NumArg(v) => if (v == v.floor) v.toLong.toString else v.toString
    case DurArg(m) => m.toString
    case RefArg(n) => n
  }
  private def strings(args: List[Arg]): Seq[String] = args.map(str)

  private def applyStage(df: DataFrame, meta: StepMeta, st: StageCall, g: QueryGrid,
                         macroDF: String => (DataFrame, StepMeta)): (DataFrame, StepMeta) = {
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
    def refM: (DataFrame, StepMeta) = st.args.collectFirst {
        case RefArg(n)  => macroDF(n)
        case PipeArg(p) => compilePipeline(p, macroDF)
      }
      .getOrElse(throw new IllegalArgumentException(s"${st.name}: missing pipeline ref"))
    def ref: DataFrame = refM._1
    def tagArgs(from: Int): Seq[String] =
      strings(st.args.drop(from)).filterNot(_.isEmpty)
    def groupTags: Seq[String] = st.args.collect { case StrArg(s) => s }
    /** Trailing tag args after the pipeline ref (ref: M3ASTConverter
      * .extractGroupByTags — binary-op tags start at child index `from`). */
    def refTags(from: Int): Seq[String] =
      st.args.drop(from).collect { case StrArg(s) => s }
    def same(d: DataFrame): (DataFrame, StepMeta) = (d, meta)

    st.name match {
      // grouping aggregations
      case "sum" | "sumSeries"              => same(Grouping.sum(df, groupTags))
      case "avg" | "average" | "averageSeries" => same(Grouping.avg(df, groupTags))
      case "min" | "minimum" | "minSeries"  => same(Grouping.min(df, groupTags))
      case "max" | "maximum" | "maxSeries"  => same(Grouping.max(df, groupTags))
      case "count" | "countSeries"          => same(Grouping.count(df, g, groupTags))
      case "multiply" | "multiplySeries"    => same(Grouping.multiplyExact(df, groupTags))
      case "range" | "rangeOfSeries"        => same(Grouping.range(df, groupTags))
      case "median" | "medianOfSeries"      =>
        same(Grouping.percentileM3(df, Seq(50.0), groupTags, interpolate = false))
      case "percentileOfSeries" | "percentile_of_series" =>
        // grammar: percentileOfSeries p… [true|false] [tags] — leading
        // consecutive in-range numerics are percentiles, then an optional
        // interpolate flag, then group-by tags
        // (ref: PercentileOfSeriesPlanNode.createPercentileOfSeriesPlanNode)
        val argStrs = strings(st.args)
        def isBool(s: String) = s.equalsIgnoreCase("true") || s.equalsIgnoreCase("false")
        def asPercentileArg(s: String): Option[Double] =
          if (isBool(s)) None
          else scala.util.Try(s.toDouble).toOption.filter(p => p >= 0 && p <= 100)
        val ps = argStrs.iterator.map(asPercentileArg).takeWhile(_.isDefined).flatten.toSeq
        if (ps.isEmpty)
          throw new IllegalArgumentException(
            "percentileOfSeries requires at least one percentile value")
        var i = ps.length
        val interpolate =
          if (i < argStrs.length && isBool(argStrs(i))) { i += 1; argStrs(i - 1).toBoolean }
          else false
        same(Grouping.percentileM3(df, ps, argStrs.drop(i), interpolate))
      case "histogramPercentile" =>
        // grammar: histogramPercentile bucketIdKey bucketRangeKey p…
        // (ref: HistogramPercentilePlanNode.of:85-120)
        if (st.args.length < 3)
          throw new IllegalArgumentException(
            "histogramPercentile function must have at least three arguments: " +
              "bucketId, bucketRange, and percentile(s)")
        val ps = st.args.drop(2).map { a =>
          val s = str(a)
          val p = try s.toDouble catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(s"Invalid percentile value: $s")
          }
          if (p < 0 || p > 100)
            throw new IllegalArgumentException(
              s"Percentiles must be between 0 and 100 (inclusive), got: $p")
          p
        }
        same(Grouping.histogramPercentile(df, str(st.args(0)), str(st.args(1)), ps))

      // mappers
      case "abs" | "absolute"      => same(Mappers.absStage(df))
      case "logarithm" | "log"     => same(Mappers.logarithm(df))
      case "sqrt" | "squareRoot"   => same(Mappers.sqrtStage(df))
      case "round"                 => same(Mappers.roundStage(df, num(0, 0).toInt))
      case "scale"                 => same(Mappers.scale(df, num(0)))
      case "divideScalar"          => same(Mappers.divideScalar(df, num(0)))
      case "offset"                => same(Mappers.offsetStage(df, num(0)))
      case "scaleToSeconds"        => same(Mappers.scaleToSeconds(df, g, num(0)))

      // temporal
      case "derivative"     => same(Temporal.derivative(df, g))
      case "perSecond"      => same(Temporal.perSecond(df))
      case "perSecondRate"  => same(Temporal.perSecondRate(df, dur(0, g.stepMs * 10)))
      case "integral"       => same(Temporal.integral(df, g,
        st.args.headOption.exists(a => str(a) == "true")))
      case "changed"        => same(Temporal.changed(df, g))
      case "timeshift"      =>
        if (st.args.length != 1)
          throw new IllegalArgumentException("Timeshift function expects exactly one argument")
        same(Temporal.timeshift(df, dur(0)))
      case "moving"         => same(Temporal.moving(df, g, dur(0), str(st.args(1))))
      case "movingAverage"  => same(Temporal.moving(df, g, dur(0), "avg"))
      case "movingSum"      => same(Temporal.moving(df, g, dur(0), "sum"))
      case "movingMin"      => same(Temporal.moving(df, g, dur(0), "min"))
      case "movingMax"      => same(Temporal.moving(df, g, dur(0), "max"))
      case "movingMedian"   => same(Temporal.moving(df, g, dur(0), "median"))
      case "keepLastValue"  => same(Temporal.keepLastValue(df, g,
        st.args.headOption.map(a => dur(0))))
      case "sustain"        => same(Temporal.sustain(df, g, dur(0)))
      case "summarize"      =>
        // the only step-changing stage: output step = interval, bucket origin
        // = the current origin when alignToFrom, else epoch-floored
        // (ref: SummarizeStage.processSeries:205-261 — newStep = interval,
        // newMinTimestamp = bucketMapper.mapToBucket(minTimestamp))
        val interval = dur(0)
        val alignToFrom = st.args.length > 2 && str(st.args(2)) == "true"
        val newStart =
          if (alignToFrom) meta.startMs
          else Math.floorDiv(meta.startMs, interval) * interval
        (Temporal.summarize(df, interval,
          if (st.args.length > 1) str(st.args(1)) else "avg",
          if (alignToFrom) meta.startMs else 0L),
          StepMeta(interval, newStart))

      // grid / null semantics
      case "transformNull"  => same(GridOps.transformNull(df, g, num(0, 0.0)))
      case "isNonNull"      => same(GridOps.isNonNull(df, g))
      case "removeEmpty"    => same(GridOps.removeEmpty(df))
      case "fallbackSeries" =>
        st.args.collectFirst {
          case RefArg(n)  => () => macroDF(n)._1
          case PipeArg(p) => () => compilePipeline(p, macroDF)._1
        } match {
          case Some(mk) => same(GridOps.fallbackSeriesBinary(df, mk()))
          case None     => same(GridOps.fallbackSeries(spark, df, g, num(0)))
        }

      // filters
      case "valueFilter"      =>
        val op = str(st.args(0)) match {
          case "eq" => "=="; case "ne" => "!="; case "ge" => ">="
          case "gt" => ">"; case "le" => "<="; case "lt" => "<"
          case sym  => sym
        }
        same(Filters.valueFilter(df, op, num(1)))
      case "removeBelowValue" => same(Filters.valueFilter(df, ">=", num(0)))
      case "removeAboveValue" => same(Filters.valueFilter(df, "<=", num(0)))
      // word-form value-filter stages: `| eq 12`
      // (ref: Constants.Functions.ValueFilter, M3PlanNodeFactory value-filter cases)
      case "eq" => same(Filters.valueFilter(df, "==", num(0)))
      case "ne" => same(Filters.valueFilter(df, "!=", num(0)))
      case "ge" => same(Filters.valueFilter(df, ">=", num(0)))
      case "gt" => same(Filters.valueFilter(df, ">", num(0)))
      case "le" => same(Filters.valueFilter(df, "<=", num(0)))
      case "lt" => same(Filters.valueFilter(df, "<", num(0)))
      case "excludeByTag"     => same(Filters.excludeByTag(df, str(st.args(0)), tagArgs(1)))
      case "tagCompare"       =>
        if (st.args.length == 2) {
          // combined form: tagCompare "<=" "key:value"
          val kv = str(st.args(1))
          val i = kv.indexOf(':')
          same(Filters.tagCompare(df, str(st.args(0)), kv.substring(0, i), kv.substring(i + 1)))
        } else same(Filters.tagCompare(df, str(st.args(0)), str(st.args(1)), str(st.args(2))))
      case "where"            => same(Filters.whereTags(df, str(st.args(0)), str(st.args(1)), str(st.args(2))))
      case "intersect"        => same(Filters.intersect(df, ref,
        refTags(1)))

      // label ops
      case "alias"       => same(LabelOps.alias(df, str(st.args(0))))
      case "aliasByTags" => same(LabelOps.aliasByTags(df, groupTags))
      case "showTags"    =>
        val inc = st.args.headOption.forall(a => str(a) != "false")
        same(LabelOps.showTags(df, inc, tagArgs(1)))
      case "mapKey"      => same(LabelOps.mapKey(df, str(st.args(0)), str(st.args(1))))
      case "tagSub"      => same(LabelOps.tagSub(df, str(st.args(0)), str(st.args(1)), str(st.args(2))))

      // series-set ops
      case "sort" | "sortSeries" =>
        val by = st.args.headOption.map(str).getOrElse("avg")
        val desc = st.args.lift(1).forall(a => str(a) != "asc")
        same(SeriesSet.sortSeries(df, by, desc))
      case "head" => same(SeriesSet.slice(df, num(0, 10).toInt))
      case "tail" => same(SeriesSet.slice(df, num(0, 10).toInt, tail = true))
      case "topK" =>
        val k = num(0, 10).toInt
        val by = st.args.lift(1).map(str).getOrElse("current")
        val desc = st.args.lift(2).forall(a => str(a) != "asc")
        same(SeriesSet.topK(df, k, by, desc))
      case "union"     => same(SeriesSet.union(Seq(df, ref)))
      case "divide" | "divideSeries" =>
        // PAIRWISE step normalization before the projection (ref: DivideStage
        // .getNormalizationStrategy; divideSeries is the same plan node and
        // tags start at child index 1 — M3ASTConverter:45,299-302)
        val (rdf, rmeta) = refM
        val (l2, r2, m2) = Normalizer.alignOperands(df, meta, rdf, rmeta, grid.endMs)
        (SeriesSet.divide(l2, r2, refTags(1)), m2)
      case "diff" | "subtract" =>
        // arg 1 (right after the ref) is a strict boolean keepNans when
        // present; tags start at arg 2. NormalizationStrategy.NONE — no
        // step alignment (ref: SubtractStage:59-77,
        // M3ASTConverter.extractKeepNansParameter:330-346)
        val (rdf, _) = refM
        val rest = st.args.drop(1)
        val keepNans = rest.headOption match {
          case None => false
          case Some(a) => str(a) match {
            case "true"  => true
            case "false" => false
            case other   => throw new IllegalArgumentException(
              s"function ${st.name} expects argument 1 of type bool, received '$other'")
          }
        }
        same(SeriesSet.diff(df, rdf, strings(rest.drop(1)), keepNans))
      case "asPercent" | "ratio" =>
        // BATCH step normalization (ref: AsPercentStage.getNormalizationStrategy)
        val (rdf, rmeta) = refM
        val (l2, r2, m2) = Normalizer.alignOperands(df, meta, rdf, rmeta, grid.endMs)
        (SeriesSet.asPercent(l2, r2, refTags(1)), m2)

      case n if unimplemented(n) =>
        throw new UnsupportedOperationException(s"M3QL function not implemented: $n")
      case n if macroNames(n) && st.args.isEmpty =>
        // bare macro reference in pipe position unions its series in
        same(SeriesSet.union(Seq(df, macroDF(n)._1)))
      case other =>
        throw new IllegalArgumentException(s"unknown M3QL stage: $other")
    }
  }
}

object M3QL {
  /** Parse + compile an M3QL query over a canonical samples DataFrame. */
  def query(spark: SparkSession, samples: DataFrame, grid: QueryGrid, q: String): DataFrame =
    new Compiler(spark, samples, grid).compile(Parser.parse(q))

  /** Entry point mirroring the reference REST surface: date-math start/end and
    * default step resolve to the evaluation grid
    * (ref: RestM3QLAction.java:56-140 via serve.QueryParams). */
  def query(spark: SparkSession, samples: DataFrame, params: graft.serve.QueryParams,
            nowMs: Long): DataFrame =
    query(spark, samples, params.grid(nowMs), params.query)

  /** `explain=true` equivalent: return the compiled plan instead of running it
    * (ref: RestM3QLAction explain param — the translated DSL; here, the
    * optimized logical + physical Spark plan). */
  def explain(spark: SparkSession, samples: DataFrame, grid: QueryGrid, q: String): String = {
    val df = query(spark, samples, grid, q)
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
  }
}
