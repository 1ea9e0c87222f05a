package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector helpers over ARRAY<FLOAT> embedding columns — pure builtin
  * `zip_with`/`aggregate` expressions (codegen'd, no UDF). */
object Vectors {
  /** Elementwise dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic +-1 hyperplane for sign-LSH (seeded; same plane set on every
    * call → signatures are reproducible across jobs). */
  private def planes(numPlanes: Int, dim: Int, seed: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Append `lsh_sig` (LONG bitmask of hyperplane signs). dim inferred=64.
    *
    * The plane dot products run through the codegen'd `float_dot` expression
    * (functions.FloatDotProduct), not the interpreted `aggregate(zip_with)`
    * form — the signature is computed for EVERY row of the corpus, so this is
    * the scan-wide hot loop of every LSH variant. Planes ride along as a
    * broadcast 1-row cross join of ARRAY<FLOAT> literal columns. */
  def withLshSignature(emb: DataFrame, vecCol: String, numPlanes: Int, seed: Int,
                       dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val spark = emb.sparkSession
    graft.functions.VectorExprs.register(spark)
    val ps = planes(numPlanes, dim, seed)
    val planeCols = ps.zipWithIndex.map { case (p, i) =>
      typedlit(p.map(_.toFloat)).as(s"_lshpl$i")
    }
    val withPlanes = emb.crossJoin(
      broadcast(spark.range(1).select(planeCols: _*)))
    val sig = (0 until numPlanes).map { i =>
      when(expr(s"float_dot($vecCol, _lshpl$i)") >= 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    withPlanes.withColumn("lsh_sig", sig)
      .drop((0 until numPlanes).map(i => s"_lshpl$i"): _*)
  }
}

/** Similarity search over an embedding column: brute-force cosine top-k as the
  * exact baseline, and an LSH-bucketed variant as the scale path (candidates
  * from near buckets only, then exact re-rank).
  */
object Similarity {

  /** Exact top-k by cosine to the query vector (query side broadcast; the
    * ranking is a distributed TakeOrdered — no global sort materialized). */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int,
                     idCol: String = "vec_id"): DataFrame = {
    graft.functions.VectorExprs.register(emb.sparkSession)
    val q = emb.where(col(idCol) === queryId)
      .select(col("embedding").as("q_emb"))
    val scored = emb.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cosine", graft.functions.VectorExprs.fastCosine("embedding", "q_emb"))
    scored
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
      .withColumn("rnk", row_number().over(Window.orderBy(col("cosine").desc, col(idCol))))
      .select(col(idCol), col("cosine"), col("rnk"))
  }

  /** Approximate top-k: sign-LSH signature buckets; candidates = vectors whose
    * signature is within `maxHamming` bits of the query's; exact cosine re-rank
    * of candidates. Recall tunes via numPlanes/maxHamming. */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int, numPlanes: Int = 8,
              maxHamming: Int = 2, idCol: String = "vec_id"): DataFrame = {
    graft.functions.VectorExprs.register(emb.sparkSession)
    val withSig = Vectors.withLshSignature(emb, "embedding", numPlanes, seed = 7)
    val q = withSig.where(col(idCol) === queryId)
      .select(col("embedding").as("q_emb"), col("lsh_sig").as("q_sig"))
    val cand = withSig.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("hamming", bit_count(col("lsh_sig").bitwiseXOR(col("q_sig"))))
      .where(col("hamming") <= maxHamming)
    cand
      .withColumn("cosine", graft.functions.VectorExprs.fastCosine("embedding", "q_emb"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
      .withColumn("rnk", row_number().over(Window.orderBy(col("cosine").desc, col(idCol))))
      .select(col(idCol), col("cosine"), col("rnk"))
  }

  /** IVF index for one corpus: centroids + the per-vector cell assignment,
    * built ONCE per corpus and persisted (MEMORY_AND_DISK) — queries reuse it
    * the way a real IVF index is built offline and probed many times, instead
    * of recomputing the full corpus×centroid assignment per query. Keyed by
    * the corpus plan's semantic hash. `nCentroids` scales with corpus size
    * (~√N, the standard IVF cell-count heuristic: ~√N cells × ~√N vectors per
    * cell balances probe cost against scan cost) with a floor of 16; the one
    * `count()` here is index-build work, not per-query driver logic. */
  private final case class IvfIndex(cents: DataFrame, assigned: DataFrame, nCentroids: Int)
  private val ivfCache = new java.util.concurrent.ConcurrentHashMap[Int, IvfIndex]()

  private def ivfIndex(emb: DataFrame, idCol: String, nCentroidsOverride: Int): IvfIndex = {
    val key = (emb.queryExecution.analyzed.semanticHash(), idCol, nCentroidsOverride).hashCode()
    ivfCache.computeIfAbsent(key, _ => {
      val nc =
        if (nCentroidsOverride > 0) nCentroidsOverride
        else math.max(16, math.sqrt(emb.count().toDouble).round.toInt)
      // centroids = deterministic sample of the corpus (ids hashed)
      val cents = emb
        .withColumn("_h", xxhash64(col(idCol)))
        .orderBy("_h").limit(nc)
        .select(col(idCol).as("cent_id"), col("embedding").as("cent_emb"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val assigned = emb.crossJoin(broadcast(cents))
        .withColumn("sim", graft.functions.VectorExprs.fastCosine("embedding", "cent_emb"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col(idCol)).orderBy(col("sim").desc, col("cent_id"))))
        .where(col("rn") === 1)
        .select(col(idCol), col("embedding"), col("cent_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      IvfIndex(cents, assigned, nc)
    })
  }

  /** IVF-style variant: kmeans-lite — partition vectors by nearest of the
    * index's centroids (deterministic sample, ~√N of them), probe the query's
    * nearest `nProbe` cells only. The 100TB path: cells are the partition
    * pruning unit, and the assignment is a persisted index shared across
    * queries. Recall@10 vs [[bruteForceTopK]] is data-dependent: on a
    * clustered corpus the probed cells hold the true neighbors; on the
    * synthetic sf0.001 corpus — UNIFORM random vectors, zero cluster
    * structure (same-label and cross-label cosine both ≈ 0) — no cell
    * assignment can beat the scan fraction, and measured recall@10 is ~0.2
    * ≈ nProbe/nCells = 4/22, i.e. exactly the pruning ratio (asserted by
    * `IvfRecallSpec`). Tune nProbe upward for recall, downward for speed. */
  def ivfTopK(emb: DataFrame, queryId: Long, k: Int, nCentroids: Int = 0,
              nProbe: Int = 4, idCol: String = "vec_id"): DataFrame = {
    graft.functions.VectorExprs.register(emb.sparkSession)
    val idx = ivfIndex(emb, idCol, nCentroids)
    val qCells = idx.assigned.where(col(idCol) === queryId).select(col("embedding").as("q_emb"))
      .crossJoin(broadcast(idx.cents))
      .withColumn("sim", graft.functions.VectorExprs.fastCosine("q_emb", "cent_emb"))
      .orderBy(col("sim").desc, col("cent_id")).limit(nProbe)
      .select(col("cent_id"), col("q_emb"))
    idx.assigned.where(col(idCol) =!= queryId)
      .join(broadcast(qCells), Seq("cent_id"))
      .withColumn("cosine", graft.functions.VectorExprs.fastCosine("embedding", "q_emb"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
      .withColumn("rnk", row_number().over(Window.orderBy(col("cosine").desc, col(idCol))))
      .select(col(idCol), col("cosine"), col("rnk"))
  }
}
