package graft

import graft.core.{Memo, PlanMemo}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Pins the standing-cache budget: the process-wide Memo ledger caps live
  * memoized frames per session (`graft.memo.maxEntries`), evicts
  * least-recently-USED first, and an evicted entry rebuilds into a
  * `sameResult`-identical plan with identical rows — eviction can only ever
  * trade recompute for memory, never results. This is the structural fix
  * for the r9 bench collapse (unbounded session caches thrashing a default
  * heap); Bench.scala additionally evicts between families. */
class MemoSpec extends SparkTestBase {

  // isolated session: its own conf (cap) and its own ledger partition, so
  // the cap-2 budget here can never evict the shared test session's caches
  private def freshSession(cap: Int) = {
    val s = spark.newSession()
    s.conf.set("graft.memo.maxEntries", cap.toString)
    s
  }

  test("memo evicts LRU past the cap and keeps recently-touched entries") {
    val s = freshSession(2)
    val memo = new Memo[Int]
    def build(i: Int): DataFrame =
      s.range(10).select((col("id") + i).as("v"))
    val d1 = memo(s, 1)(build(1)); d1.count()
    val d2 = memo(s, 2)(build(2)); d2.count()
    // touch 1 so 2 becomes the LRU victim
    memo(s, 1)(fail("key 1 must still be memoized"))
    val d3 = memo(s, 3)(build(3)); d3.count()
    assert(d1.storageLevel != StorageLevel.NONE, "recently-touched entry survived")
    assert(d3.storageLevel != StorageLevel.NONE, "newest entry survived")
    assert(d2.storageLevel == StorageLevel.NONE, "LRU entry was unpersisted")
    assert(Memo.liveEntries(s) == 2)

    // the evicted key rebuilds: sameResult-identical plan, identical rows
    var rebuilt = false
    val d2b = memo(s, 2) { rebuilt = true; build(2) }
    assert(rebuilt, "evicted entry must rebuild on next request")
    assert(d2b.queryExecution.analyzed.sameResult(d2.queryExecution.analyzed),
      "re-derived frame must be sameResult-identical to the evicted one")
    assert(d2b.collect().map(_.getLong(0)).sorted
      .sameElements(d2.collect().map(_.getLong(0)).sorted))
    Memo.clearSession(s)
    assert(Memo.liveEntries(s) == 0)
  }

  test("planMemo frees evicted values and rebuilds sameResult-identical") {
    val s = freshSession(2)
    var freed = List.empty[String]
    val pm = new PlanMemo[String, DataFrame](df => {
      freed ::= df.columns.head; df.unpersist(blocking = false)
    })
    val src = s.range(100).toDF("id")
    // distinct literals per entry: alias names canonicalize away, so three
    // `sum(id) AS x` frames would share ONE CacheManager entry and
    // unpersisting any would blank all three — not what this test pins
    def build(name: String, shift: Int): DataFrame =
      src.select(sum(col("id") + shift).as(name)).persist(StorageLevel.MEMORY_AND_DISK)
    val a = pm(src, "a")(build("a", 0))
    val b = pm(src, "b")(build("b", 1))
    val c = pm(src, "c")(build("c", 2)) // over cap: evicts "a" (LRU)
    assert(freed == List("a"), s"expected a freed, got $freed")
    assert(a.storageLevel == StorageLevel.NONE)
    assert(b.storageLevel != StorageLevel.NONE && c.storageLevel != StorageLevel.NONE)

    var rebuilt = false
    val a2 = pm(src, "a") { rebuilt = true; build("a", 0) }
    assert(rebuilt, "evicted planMemo entry must rebuild")
    assert(a2.queryExecution.analyzed.sameResult(a.queryExecution.analyzed))
    assert(a2.collect().head.getLong(0) == 4950L)
    Memo.clearSession(s)
    assert(Memo.liveEntries(s) == 0)
  }

  test("distinct memos with EQUAL keys never alias in the ledger") {
    // chainMemo/clusterMemo/portablePairsMemo are all Memo[String] keyed by
    // the same sf string — their ledger tokens must be per-instance, or the
    // later add() replaces the earlier memo's slot (that frame escaping the
    // LRU cap and liveEntries) and one memo's eviction drops the other's
    // distinct literals per frame: aliases canonicalize away, so two
    // `range(n)` frames would share ONE CacheManager entry and unpersisting
    // either would blank both — same discipline as the planMemo test above
    val s = freshSession(100)
    val m1 = new Memo[String]
    val m2 = new Memo[String]
    val d1 = m1(s, "sf0.01")(s.range(10).select((col("id") + 1).as("a"))); d1.count()
    val d2 = m2(s, "sf0.01")(s.range(10).select((col("id") + 2).as("b"))); d2.count()
    assert(Memo.liveEntries(s) == 2,
      "two memos with the same key must occupy two ledger slots")
    assert(d1.storageLevel != StorageLevel.NONE)
    assert(d2.storageLevel != StorageLevel.NONE)
    // cap-overflow eviction in one memo must never free the other's frame
    val s2 = freshSession(1)
    val e1 = m1(s2, "k")(s2.range(3).select((col("id") + 1).as("a"))); e1.count()
    val e2 = m2(s2, "k")(s2.range(3).select((col("id") + 2).as("b"))); e2.count() // evicts e1 (LRU)
    assert(e1.storageLevel == StorageLevel.NONE, "LRU slot (m1) evicted")
    assert(e2.storageLevel != StorageLevel.NONE, "m2's frame must survive")
    assert(Memo.liveEntries(s2) == 1)
    Memo.clearSession(s); Memo.clearSession(s2)
    assert(Memo.liveEntries(s) == 0 && Memo.liveEntries(s2) == 0)
  }

  test("clearSession releases every entry and hook-registered value") {
    val s = freshSession(100)
    val memo = new Memo[String]
    val df = memo(s, "x")(s.range(5).toDF("id"))
    df.count()
    assert(df.storageLevel != StorageLevel.NONE)
    assert(Memo.liveEntries(s) == 1)
    Memo.clearSession(s)
    assert(df.storageLevel == StorageLevel.NONE)
    assert(Memo.liveEntries(s) == 0)
  }
}
