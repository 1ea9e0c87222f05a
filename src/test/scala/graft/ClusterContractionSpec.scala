package graft

import graft.pipelines.Dedup
import org.apache.spark.sql.functions._

/** The contraction's worst case, pinned as assertions (r11 verdict item 5):
  * a path component scattered so (nearly) EVERY edge is a partition
  * crossing — each partition's local union-find then collapses nothing and
  * the boundary graph ≈ the full graph. The guarantee under that
  * hostility: the distributed loop still converges within the plain
  * pointer-doubling bound, i.e. contraction can only remove rounds, never
  * add them, and labels stay exact. */
class ClusterContractionSpec extends SparkTestBase {

  private val n = 4096L

  /** chain edges (i, i+1), i in [0, n-1) — one path component. */
  private def chain = spark.range(n - 1).toDF("doc_id_a")
    .withColumn("doc_id_b", col("doc_id_a") + 1L)

  private def labelsOk(df: org.apache.spark.sql.DataFrame): Unit = {
    val rows = df.collect()
    assert(rows.length == n, s"every node must surface, got ${rows.length}")
    assert(rows.forall(_.getLong(1) == 0L),
      "one path component: every node labels to the minimum id 0")
  }

  test("scattered path: every edge a partition crossing, rounds within the " +
       "pointer-doubling bound, labels exact") {
    // Dist.scatterByMod pins edge (i, i+1) to partition i mod 13 with an
    // explicit partitioner (repartition by pmod would re-hash the residue
    // and collisions would co-locate some adjacent edges): node i+1 is
    // seen by the partitions of edges i and i+1 with two different local
    // roots, so the boundary graph is the whole chain — the identical
    // construction the soak's hostile row measures
    val hostile = graft.core.Dist.scatterByMod(chain, 13)
    labelsOk(Dedup.clusterPairs(hostile))
    val hostileRounds = Dedup.lastLoopRounds
    // the same chain with contraction OFF — the plain pointer-doubling
    // loop, whose round count is the bound the hostile case must not beat
    labelsOk(Dedup.clusterPairs(chain, localContract = false))
    val fallbackRounds = Dedup.lastLoopRounds
    info(s"rounds: hostile-contracted=$hostileRounds fallback=$fallbackRounds")
    assert(hostileRounds <= fallbackRounds,
      s"contraction under hostile partitioning must never exceed the plain " +
        s"pointer-doubling loop: $hostileRounds vs $fallbackRounds")
    // absolute sanity: each round is one neighbor-min step plus two hops
    // through the previous map — ~3× reach per round, so a 4096-node path
    // needs ceil(log3 4096) = 8 productive rounds + the confirming round
    // (measured: exactly 9 for both paths)
    assert(fallbackRounds <= 9, s"pointer-doubling bound blown: $fallbackRounds")
  }

  test("contiguous path: contraction collapses partition-local runs, loop " +
       "tracks partition crossings only") {
    // spark.range splits [0,n) into contiguous blocks: each partition's
    // sub-chain contracts locally, the boundary graph is ~numPartitions
    // clique edges, and the loop finishes in O(log crossings) rounds
    labelsOk(Dedup.clusterPairs(chain))
    val contiguousRounds = Dedup.lastLoopRounds
    info(s"rounds: contiguous-contracted=$contiguousRounds")
    assert(contiguousRounds <= 3,
      s"contiguous chain must converge in O(log partitions) rounds, got $contiguousRounds")
  }

  test("union-find table stays inside the stated 24-49 B/node band at " +
       "capacity (measured, not computed)") {
    // sizes straddling table doublings: load ≤0.7 bounds the low end
    // (17 B/slot ÷ 0.7 ≈ 24.3 B/node), a just-grown table the high end
    // (load ≈0.35 → ~48.6). Small n is excluded — the constructor doubles
    // the requested 4096-slot capacity to 8192, so below ~6k nodes the
    // fixed initial table dominates B/node (5000 still lands in-band:
    // 8192 slots × 17 B ÷ 5000 ≈ 27.8 B/node, by floor not load).
    // 11468/11469 straddle a doubling (grow fires past load 0.7 at 11469):
    // the pair lands on both ends of the band in one run
    for (nodes <- Seq(5000, 11468, 11469, 50000, 500000)) {
      val (bytes, registered, perNode) = Dedup.unionFindMemory(nodes)
      assert(registered == nodes, s"registered $registered != $nodes")
      info(f"$nodes%7d nodes: $bytes%9d B, $perNode%.1f B/node")
      assert(perNode >= 24.0 && perNode <= 49.0,
        s"$nodes nodes: $perNode B/node outside the stated band")
    }
  }
}
