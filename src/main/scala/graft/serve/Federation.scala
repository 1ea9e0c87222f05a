package graft.serve

import graft.core.{QueryGrid, TsSchema}
import graft.lang.m3.M3QL
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Federated (multi-partition / cross-cluster) M3QL evaluation over resolved
  * partition windows — the reference's FederationMetadata contract
  * (query/federation/FederationMetadata.java:10-22).
  *
  * When a series may span partitions with OVERLAPPING time windows, stages
  * needing historical context (moving, rate, keepLastValue) cannot be pushed
  * down: the query runs ONCE over the merged scan (coordinator-level). With
  * DISJOINT windows the reference pushes the pipeline down and evaluates it
  * per partition — temporal lookback then deliberately does NOT cross a
  * partition boundary. That per-partition answer is reproduced here exactly,
  * including its documented divergence from the global answer during data
  * migration (multi_index_data_migration_rest_it.yaml: "7, 15 instead of
  * 13, 15 … an incorrect result, in case of pushdown with migration").
  *
  * At scale this is the point of the contract: disjoint windows mean each
  * partition's evaluation is an independent job over a pruned scan (the
  * resolved window is the partition-pruning predicate), and the merge is one
  * shuffle over already-reduced query results, not raw samples.
  */
object Federation {
  private val S = TsSchema

  final case class PartitionWindow(partition: String, startMs: Long, endMs: Long)

  /** The storage catalog's index-existence failure (ref: the REST layer's
    * 404 `index_not_found_exception` — resolved_partitions corpus test 6).
    * Message mirrors the reference's "no such index [...]" reason. */
  final case class PartitionNotFoundException(partition: String)
    extends RuntimeException(s"no such index [$partition]")

  /** Catalog existence check, raised BEFORE planning: every resolved
    * partition must name a known index — a missing one is a request error,
    * not an empty result (an empty result is what a known index without the
    * metric yields; corpus test 7). */
  def requirePartitions(known: Set[String], requested: Seq[String]): Unit =
    requested.find(p => !known(p)).foreach(p => throw PartitionNotFoundException(p))

  /** True when any two windows overlap in time (ref: hasOverlappingPartitions). */
  def hasOverlappingPartitions(ws: Seq[PartitionWindow]): Boolean =
    ws.sortBy(_.startMs).sliding(2).exists {
      case Seq(a, b) => b.startMs < a.endMs
      case _         => false
    }

  /** Evaluate `q` over resolved partitions.
    *
    *  - Disjoint windows: full-pipeline pushdown — evaluate per partition over
    *    that partition's window-clipped scan, then merge per
    *    (series, timestamp); on a conflict the LATEST-starting partition wins
    *    (the migration target owns the point, matching the reference's merged
    *    pushdown output).
    *  - Overlapping windows (or a single partition): coordinator-level — one
    *    evaluation over the unioned scans with FIRST-partition dedup of
    *    duplicated samples (the unfold dedup policy,
    *    TimeSeriesUnfoldAggregator.java:270-276).
    */
  def query(spark: SparkSession, parts: Seq[(PartitionWindow, DataFrame)],
            grid: QueryGrid, q: String): DataFrame =
    if (parts.sizeIs <= 1 || hasOverlappingPartitions(parts.map(_._1))) {
      // FIRST-partition dedup must be DETERMINISTIC: dropDuplicates keeps an
      // arbitrary survivor, so a sample duplicated across partitions with
      // CONFLICTING values would flip between runs. Tag each scan with its
      // partition rank (earliest start first) and take min_by — the mirror of
      // the disjoint path's max_by merge, honoring the unfold FIRST policy
      // (TimeSeriesUnfoldAggregator.java:270-276).
      // The rank must be total-ordered on the WINDOWS, not the caller's Seq
      // order: two windows sharing startMs tie-break on endMs then partition
      // name, so the survivor is identical however the caller lists them.
      val tagged = parts.sortBy(p => (p._1.startMs, p._1.endMs, p._1.partition))
        .zipWithIndex.map { case ((_, df), i) =>
          df.withColumn("_pord", lit(i))
        }
      val merged = tagged.reduce(_ unionByName _)
        .groupBy(col(S.SeriesId), col(S.Ts))
        .agg(first(col(S.LabelsCol)).as(S.LabelsCol),
          expr(s"min_by(${S.Value}, _pord)").as(S.Value))
        .select(S.SeriesId, S.LabelsCol, S.Ts, S.Value)
      M3QL.query(spark, merged, grid, q)
    } else {
      val results = parts.sortBy(p => (p._1.startMs, p._1.endMs, p._1.partition))
        .zipWithIndex.map { case ((w, df), i) =>
          M3QL.query(spark, df.where(col(S.Ts) >= w.startMs && col(S.Ts) < w.endMs), grid, q)
            .withColumn("_pord", lit(i))
        }
      results.reduce(_ unionByName _)
        .groupBy(col(S.SeriesId), col(S.Ts))
        .agg(first(col(S.LabelsCol)).as(S.LabelsCol),
          expr(s"max_by(${S.Value}, _pord)").as(S.Value))
        .select(S.SeriesId, S.LabelsCol, S.Ts, S.Value)
    }
}
