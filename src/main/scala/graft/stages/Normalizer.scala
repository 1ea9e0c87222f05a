package graft.stages

import graft.core.{OracleSafe, QueryGrid, StepMeta, TsSchema}
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
    * consolidation function. One shuffle on (series, slot). With
    * `skipNaN=true` (the TimeSeriesNormalizer behavior — NaN samples skipped,
    * an all-NaN slot emits nothing; ref: TimeSeriesNormalizer.java:330-371);
    * the fetch-unfold path passes `skipNaN=false` because the unfold keeps
    * the latest sample per slot NaN included (TimeSeriesUnfoldAggregator
    * :305-320 has no NaN filter). */
  def resample(df: DataFrame, targetGrid: QueryGrid, fn: String = "avg",
               skipNaN: Boolean = true): DataFrame = {
    val slot = targetGrid.bucket(col(S.Ts))
    val in = if (skipNaN) df.where(col(S.Value).isNotNull && !isnan(col(S.Value))) else df
    in.withColumn("_slot", slot)
      .where(col("_slot") >= targetGrid.startMs && col("_slot") < targetGrid.endMs)
      .groupBy(col(S.SeriesId), col(S.LabelsCol), col("_slot").as(S.Ts))
      .agg(consolidate(fn)(col(S.Value)).as(S.Value))
      .select(S.SeriesId, S.LabelsCol, S.Ts, S.Value)
  }

  /** TYPE_AWARE consolidation: SUM for series labeled type:counter, AVG
    * otherwise (ref: ConsolidationFunction.TYPE_AWARE). */
  def resampleTypeAware(df: DataFrame, targetGrid: QueryGrid): DataFrame = {
    val slot = targetGrid.bucket(col(S.Ts))
    // counter and counts, case-insensitive (ref: ConsolidationStrategy.TYPE_AWARE)
    val isCounter = lower(col(S.LabelsCol).getItem("type")).isin("counter", "counts")
    df.where(col(S.Value).isNotNull && !isnan(col(S.Value)))
      .withColumn("_slot", slot)
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

  /** Normalize N operands onto their common grid the way the reference runs
    * TimeSeriesNormalizer (LCM step, AVG consolidation — ref:
    * TimeSeriesNormalizer.java:188-268): common step = LCM of all steps,
    * bucket origin = min of the operand origins. An operand already on the
    * target grid (same step, origin a step-multiple away) is passed through
    * untouched, like the reference's already-aligned check
    * (AbstractBinaryProjectionStage.java:295-298). */
  def alignAll(ops: Seq[(DataFrame, StepMeta)], endMs: Long): (Seq[DataFrame], StepMeta) = {
    val metas = ops.map(_._2)
    val start = metas.map(_.startMs).min
    val step0 = metas.head.stepMs
    if (metas.forall(m => m.stepMs == step0 && (m.startMs - start) % step0 == 0))
      (ops.map(_._1), StepMeta(step0, start))
    else {
      val step = metas.map(_.stepMs).reduce(lcm)
      val end = start + ((endMs - start + step - 1) / step) * step
      val target = QueryGrid(start, end, step)
      (ops.map { case (df, m) =>
        if (m.stepMs == step && (m.startMs - start) % step == 0) df
        else resample(df, target, "avg")
      }, StepMeta(step, start))
    }
  }

  /** Normalize the two operands of a binary projection when their compile-time
    * steps differ (PAIRWISE/BATCH inside AbstractBinaryProjectionStage
    * .java:266-317). */
  def alignOperands(left: DataFrame, lm: StepMeta, right: DataFrame, rm: StepMeta,
                    endMs: Long): (DataFrame, DataFrame, StepMeta) = {
    val (dfs, m) = alignAll(Seq((left, lm), (right, rm)), endMs)
    (dfs(0), dfs(1), m)
  }

  /** Collapse union branches to one DataFrame WITHOUT resampling — the
    * reference's UnionStage concatenates series keeping each one's own step
    * (UnionStage.java:23-30). When branch steps disagree the combined meta is
    * the conservative LCM/min-origin pair, so a later step-sensitive stage
    * that cannot see per-branch metas still makes a sane decision. */
  def collapse(bs: Seq[(DataFrame, StepMeta)]): (DataFrame, StepMeta) =
    if (bs.lengthCompare(1) == 0) bs.head
    else {
      val metas = bs.map(_._2)
      val meta =
        if (metas.distinct.lengthCompare(1) == 0) metas.head
        else StepMeta(metas.map(_.stepMs).reduce(lcm), metas.map(_.startMs).min)
      (SeriesSet.union(bs.map(_._1)), meta)
    }

  /** Collapse union branches for a grouping aggregation: the reference's
    * coordinator normalizes each group's series with MAX step strategy and
    * TYPE_AWARE consolidation before aggregating (AbstractGroupingStage
    * .java:122-123,208-222). Branch-level approximation of the per-group
    * normalize: every series of a branch shares the branch's step, so
    * resampling whole branches is exact whenever a group draws from all
    * branches (the common case); a group fed by a strict subset of branches
    * would see a slightly coarser grid than the reference's per-group MAX. */
  def collapseGrouping(bs: Seq[(DataFrame, StepMeta)], endMs: Long): (DataFrame, StepMeta) = {
    val metas = bs.map(_._2)
    if (bs.lengthCompare(1) == 0 || metas.distinct.lengthCompare(1) == 0) collapse(bs)
    else {
      val step = metas.map(_.stepMs).max
      val start = metas.map(_.startMs).min
      val target = QueryGrid(start, start + ((endMs - start + step - 1) / step) * step, step)
      val dfs = bs.map { case (df, m) =>
        if (m.stepMs == step && (m.startMs - start) % step == 0) df
        else resampleTypeAware(df, target)
      }
      (SeriesSet.union(dfs), StepMeta(step, start))
    }
  }
}
