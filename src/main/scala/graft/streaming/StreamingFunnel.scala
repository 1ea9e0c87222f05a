package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING funnel — the batch cascade of
  * [[graft.stages.TimeJoins.funnel]] maintained incrementally over a live
  * event stream with custom state.
  *
  * The first-touch cascade is NOT prefix-monotone under out-of-order
  * arrival (a late, earlier step-1 event moves the whole window and can
  * both enable and disable later steps), so per-key state keeps the step
  * timestamps seen so far — bounded by one key's funnel activity, the same
  * bound the batch groupBy carries — and re-derives the cascade per
  * trigger. Each snapshot carries a monotone events-seen counter so an
  * append-only sink can reduce to the latest snapshot per key
  * (`max_by(..., n_seen)`); after the final trigger the snapshot equals
  * the batch funnel EXACTLY (pinned by the shared oracle of
  * `streaming_funnel` / `events_funnel`).
  *
  * Emits `(key, n_seen, ts ARRAY<LONG> — null-padded per unreached step,
  * reached INT)` for keys that have entered the funnel. */
object StreamingFunnel {

  case class FState(seen: Map[Int, List[Long]], nEvents: Long)

  def funnel(events: DataFrame, steps: Seq[String], windowMs: Long,
             keyCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "tm"): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(windowMs > 0, "funnel window must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val stepCol = steps.zipWithIndex.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col(typeCol) === s, lit(i)).otherwise(acc)
    }
    val rows = events
      // IN-list first: the scan prunes to the funnel's own event types
      .where(col(typeCol).isin(steps: _*))
      .select(col(keyCol).cast("long").as("_k"), stepCol.as("_step"),
        col(tsCol).cast("long").as("_t"))
      .as[(Long, Int, Long)]
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[FState, (Long, Long, Seq[Option[Long]], Int)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[(Long, Int, Long)], st: GroupState[FState]) =>
          var m = st.getOption.map(_.seen).getOrElse(Map.empty[Int, List[Long]])
          var n = st.getOption.map(_.nEvents).getOrElse(0L)
          it.foreach { case (_, i, t) =>
            m = m.updated(i, t :: m.getOrElse(i, Nil)); n += 1
          }
          // STATE BOUND (r14, surfaced by the streaming soak): the cascade
          // anchor (min step-0 time) can only DECREASE as late events
          // arrive, so its match window [anchor, anchor+windowMs] only ever
          // moves EARLIER — a timestamp above anchor+windowMs can never
          // match again and is pruned, and step 0 keeps only the anchor
          // itself (the cascade reads nothing else from it). Timestamps
          // BELOW the anchor must stay: a later, earlier anchor can
          // resurrect them (pinned in StreamingFunnelSpec). Without this
          // the state held every event ever seen per key — the 100x soak
          // measured 129 MB for 1 000 keys, state tracking event DENSITY
          // instead of cardinality; with it, state is O(events at or below
          // the window's high edge).
          m.getOrElse(0, Nil) match {
            case Nil => ()
            case l =>
              val hi = l.min + windowMs
              m = m.map { case (i, ts) =>
                if (i == 0) (i, List(l.min)) else (i, ts.filter(_ <= hi))
              }
          }
          st.update(FState(m, n))
          val sorted = steps.indices.map(i => m.getOrElse(i, Nil).sorted)
          sorted.head.headOption match {
            case None => Iterator.empty
            case Some(start) =>
              val ts = steps.indices.tail.scanLeft(Option(start)) { (prev, i) =>
                prev.flatMap(p =>
                  sorted(i).find(t => t >= p && t <= start + windowMs))
              }
              Iterator.single((key, n, ts, ts.takeWhile(_.isDefined).size))
          }
      }
      .toDF(keyCol, "n_seen", "ts", "reached")
  }
}

/** STREAMING first-order transition matrix — the batch
  * [[graft.stages.TimeJoins.transitionMatrix]] maintained incrementally.
  * Consecutive-pair extraction is not monotone under out-of-order arrival
  * (a late event INSERTED between two already-paired events splits their
  * (from → to) pair into two different ones), so per-key state holds the
  * (ts, tie, type) events seen so far — bounded by one key's event count,
  * the same bound the batch per-key window carries — and each trigger
  * re-emits the key's full consecutive-pair multiset with a monotone
  * events-seen counter for latest-snapshot reduction in the sink. The
  * reduced snapshots, exploded and counted, equal the BATCH matrix
  * exactly (shared oracle of `streaming_transition_matrix` /
  * `events_transition_matrix`). */
object StreamingTransitions {

  case class TState(evs: List[(Long, Long, String)], nEvents: Long)

  /** Emits `(key, n_seen, froms ARRAY<STRING>, tos ARRAY<STRING>)` —
    * parallel arrays of the key's consecutive-pair multiset so far. */
  def transitions(events: DataFrame, keyCol: String = "user_id",
                  tsCol: String = "tm", typeCol: String = "event_type",
                  tieCol: String = "event_id"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val rows = events.select(col(keyCol).cast("long").as("_k"),
        col(tsCol).cast("long").as("_t"), col(tieCol).cast("long").as("_i"),
        col(typeCol).cast("string").as("_e"))
      .as[(Long, Long, Long, String)]
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[TState, (Long, Long, Seq[String], Seq[String])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[(Long, Long, Long, String)],
         st: GroupState[TState]) =>
          var evs = st.getOption.map(_.evs).getOrElse(Nil)
          var n = st.getOption.map(_.nEvents).getOrElse(0L)
          it.foreach { case (_, t, i, e) => evs = (t, i, e) :: evs; n += 1 }
          st.update(TState(evs, n))
          val sorted = evs.sortBy(x => (x._1, x._2))
          val pairs = sorted.zip(sorted.drop(1))
          Iterator.single((key, n, pairs.map(_._1._3), pairs.map(_._2._3)))
      }
      .toDF(keyCol, "n_seen", "froms", "tos")
  }
}

/** STREAMING retention cohorts — the batch
  * [[graft.stages.TimeJoins.retentionCohorts]] maintained incrementally.
  * Cohort assignment is not monotone under out-of-order arrival (a late,
  * EARLIER event moves the key's first touch, which shifts EVERY offset the
  * key has reported), so per-key state holds the distinct activity periods
  * seen so far — bounded by the observation span in periods, not by event
  * count — and each trigger re-emits the key's full (cohort, periods)
  * snapshot with a monotone events-seen counter for latest-snapshot
  * reduction in the sink. */
object StreamingCohorts {

  case class CState(periods: Set[Long], nEvents: Long)

  /** Emits `(key, n_seen, cohort, periods ARRAY<LONG> sorted)`. */
  def cohorts(events: DataFrame, periodMs: Long,
              keyCol: String = "user_id",
              tsCol: String = "tm"): DataFrame = {
    require(periodMs > 0, "retention period must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val rows = events
      .select(col(keyCol).cast("long").as("_k"),
        floor(col(tsCol) / lit(periodMs.toDouble)).cast("long").as("_p"))
      .as[(Long, Long)]
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[CState, (Long, Long, Long, Seq[Long])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[(Long, Long)], st: GroupState[CState]) =>
          var ps = st.getOption.map(_.periods).getOrElse(Set.empty[Long])
          var n = st.getOption.map(_.nEvents).getOrElse(0L)
          it.foreach { case (_, p) => ps += p; n += 1 }
          st.update(CState(ps, n))
          val sorted = ps.toSeq.sorted
          Iterator.single((key, n, sorted.head, sorted))
      }
      .toDF(keyCol, "n_seen", "cohort", "periods")
  }
}
