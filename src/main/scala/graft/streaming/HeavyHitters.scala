package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming HEAVY HITTERS over a document token stream — the space-saving
  * sketch (Metwally et al. 2005) in Structured Streaming custom state:
  * per-shard top-token summaries with HARD-BOUNDED state, for hot-gram /
  * trending-token / boilerplate detection over a crawl stream where exact
  * per-token counts would grow state with vocabulary size forever.
  *
  * Algorithm (per shard): keep at most `capacity` counters. A seen token
  * increments its counter; an unseen token with free capacity starts at 1;
  * otherwise it REPLACES the minimum counter m, starting at m.count+1 with
  * error=m.count (the classic space-saving step — deterministic here via a
  * (count, token) eviction order). Guarantees: any token with true shard
  * frequency > N_shard/capacity is present, and
  * count − error ≤ true ≤ count.
  *
  * Scale/streaming shape: tokens shard by hash (`shards` parallel state
  * keys — state is per key, so memory is shards × capacity counters,
  * independent of corpus size); `flatMapGroupsWithState` folds each
  * micro-batch into the shard's summary and emits the updated snapshot
  * (tokens at count ≥ `minCount`). A token maps to exactly one shard, so
  * per-token counts are globally consistent. The identical function runs in
  * batch mode (one fold over the whole group). With `capacity` at or above
  * a shard's distinct-token count nothing is ever evicted and the summary
  * is EXACT — the oracle-checkable degenerate mode
  * (`streaming_heavy_hitters`); the bounded-capacity approximation is
  * spec-tested against the space-saving guarantee.
  */
object HeavyHitters {

  /** Per-shard summary state: token → (count, overestimate error). */
  case class HHState(entries: Map[String, (Long, Long)])

  private def fold(capacity: Int)(m: Map[String, (Long, Long)],
                                  t: String): Map[String, (Long, Long)] =
    m.get(t) match {
      case Some((c, e)) => m.updated(t, (c + 1, e))
      case None if m.size < capacity => m.updated(t, (1L, 0L))
      case None =>
        // evict the (count, token)-minimal entry — deterministic tie-break
        val (vt, (vc, _)) = m.minBy { case (tok, (c, _)) => (c, tok) }
        (m - vt).updated(t, (vc + 1, vc))
    }

  /** Tokenize `textCol`, shard by token hash, and maintain the per-shard
    * space-saving summary. Works over a streaming OR batch frame; streaming
    * queries must use Update output mode (each trigger emits the updated
    * snapshots — in an append-only sink, reduce to the latest per token
    * with max(count), counts are monotone). Output:
    * (shard INT, token STRING, count LONG, error LONG). */
  def heavyHitters(docs: DataFrame, capacity: Int, shards: Int,
                   minCount: Long, textCol: String = "text"): DataFrame = {
    require(capacity >= 1 && shards >= 1, "capacity and shards must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks: Dataset[(Int, String)] = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .where(length(col("token")) > 0)
      .select(pmod(xxhash64(col("token")), lit(shards.toLong)).cast("int").as("shard"),
        col("token"))
      .as[(Int, String)]
    val step = fold(capacity) _
    toks.groupByKey(_._1)
      .flatMapGroupsWithState[HHState, (Int, String, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[(Int, String)], st: GroupState[HHState]) =>
          var m = st.getOption.map(_.entries).getOrElse(Map.empty[String, (Long, Long)])
          rows.foreach { case (_, t) => m = step(m, t) }
          st.update(HHState(m))
          m.iterator.collect {
            case (t, (c, e)) if c >= minCount => (shard, t, c, e)
          }
      }
      .toDF("shard", "token", "count", "error")
  }
}
