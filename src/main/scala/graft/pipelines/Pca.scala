package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Principal-component analysis over the embedding corpus, Spark-first:
  * the only corpus-sized passes are (1) the per-position mean, (2) the
  * dim×dim Gram matrix of centered vectors, and (3) the final projection —
  * all shuffle at most dim² = 4096 groups with map-side partial aggregation,
  * so the reduce traffic is constant in corpus size. The power iteration
  * itself runs on the driver over the collected dim×dim matrix (bounded,
  * corpus-independent), mirroring the k-means centroid-loop contract.
  *
  * Cross-engine determinism (the DuckDB oracle replays every step):
  * - means and Gram entries accumulate as scale-0 DECIMAL(38,0) sums of
  *   `floor(value·1e9)` — floor of the same IEEE double in both engines,
  *   integer addition thereafter, so no rounding-mode exposure (the k-means
  *   re-centering discipline).
  * - every dot product and norm folds SEQUENTIALLY in index order (a Scala
  *   while-loop here, `list_reduce` there); sqrt and divide are IEEE
  *   correctly-rounded in both engines.
  * - the start vector is the exact literal 1/sqrt(dim).
  *
  * Scale note: the Gram pass explodes each row into dim² products before
  * the partial aggregate — CPU amplification, not shuffle amplification
  * (4096 groups). At extreme scale a per-partition outer-product
  * accumulator (mapPartitions) would cut the explode overhead; the
  * declarative form keeps whole-stage codegen and needs no custom state.
  */
object Pca {

  /** Per-position nano-quantized means, collected (dim values, bounded). */
  private def means(emb: DataFrame, vecCol: String): Array[Double] =
    emb.select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy("i")
      .agg((sum(floor(col("x").cast(DoubleType) * lit(1e9))
          .cast(DecimalType(38, 0))).cast(DoubleType) /
        count(col("x")) / lit(1e9)).as("m"))
      .orderBy("i").collect().map(_.getDouble(1))

  /** Centered Gram matrix entries g(i)(j), decimal-summed then collected
    * (dim² values, bounded). `centered` must expose a double array `c`. */
  private def gram(centered: DataFrame, dim: Int): Array[Array[Double]] = {
    val rows = centered
      .select(col("c"), posexplode(col("c")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("c")).as(Seq("j", "xj")))
      .groupBy("i", "j")
      .agg((sum(floor(col("xi") * col("xj") * lit(1e9))
          .cast(DecimalType(38, 0))).cast(DoubleType) / lit(1e9)).as("g"))
      .collect()
    val g = Array.ofDim[Double](dim, dim)
    rows.foreach(r => g(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    g
  }

  /** Sequential index-order fold of a(k)*b(k) — the list_reduce twin. */
  private def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var k = 0
    while (k < a.length) { acc += a(k) * b(k); k += 1 }
    acc
  }

  /** Power-iterate G on the driver: v ← normalize(G·v), `iters` rounds from
    * the exact literal start 1/sqrt(dim). Returns the unit loading vector. */
  private def powerIterate(g: Array[Array[Double]], iters: Int): Array[Double] = {
    val dim = g.length
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim)(i => dotSeq(g(i), v))
      val norm = math.sqrt(dotSeq(w, w))
      v = w.map(_ / norm)
    }
    v
  }

  /** Projection of every vector onto the first principal component:
    * `(idCol, pc1)` where pc1 = (x − mean)·v₁, the fold in index order.
    * The mean and loading vectors ride the plan as literals (no join). */
  def pc1Projections(emb: DataFrame, iters: Int = 10, dim: Int = 64,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val m = means(emb, vecCol)
    require(m.length == dim, s"corpus dim ${m.length} != configured $dim")
    val mLit = array(m.map(lit): _*)
    val centered = emb.select(col(idCol),
      zip_with(col(vecCol), mLit, (x, mm) => x.cast(DoubleType) - mm).as("c"))
    val v = powerIterate(gram(centered, dim), iters)
    val vLit = array(v.map(lit): _*)
    val pc1: Column = aggregate(
      zip_with(col("c"), vLit, (x, w) => x * w),
      lit(0.0), (acc, t) => acc + t)
    centered.select(col(idCol), pc1.as("pc1")).orderBy(col(idCol))
  }

  /** DuckDB replay of [[pc1Projections]]: the same mean/Gram decimal sums,
    * the power iteration unrolled into chained CTEs over a list-of-lists
    * Gram, every fold a `list_reduce` in index order. */
  def pc1ProjectionsSql(iters: Int = 10, dim: Int = 64): String = {
    def fold(terms: String) =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE), $terms),
         |      (acc, x) -> acc + x)""".stripMargin
    val steps = (1 to iters).map { t =>
      val prev = if (t == 1) "v0" else s"v${t - 1}"
      s"""w$t AS (SELECT list_transform(generate_series(1, $dim), i ->
         |    ${fold(s"list_transform(generate_series(1, $dim), j -> gl.rows[i][j] * p.v[j])")}) AS w
         |  FROM gl, $prev p),
         |v$t AS (SELECT list_transform(w.w, x -> x / sqrt(
         |    ${fold("list_transform(w.w, y -> y * y)")})) AS v FROM w$t w)""".stripMargin
    }.mkString(",\n")
    s"""WITH pos AS (SELECT unnest(generate_series(1, $dim)) AS i),
       |means AS (SELECT p.i,
       |    CAST(sum(CAST(floor(CAST(e.embedding[p.i] AS DOUBLE) * 1e9)
       |      AS DECIMAL(38,0))) AS DOUBLE) / count(*) / 1e9 AS m
       |  FROM embeddings e CROSS JOIN pos p GROUP BY p.i),
       |ml AS (SELECT list(m ORDER BY i) AS m FROM means),
       |gram AS (SELECT a.i, b.i AS j,
       |    CAST(sum(CAST(floor(
       |      ((CAST(e.embedding[a.i] AS DOUBLE) - ma.m) *
       |       (CAST(e.embedding[b.i] AS DOUBLE) - mb.m)) * 1e9)
       |      AS DECIMAL(38,0))) AS DOUBLE) / 1e9 AS g
       |  FROM embeddings e CROSS JOIN pos a CROSS JOIN pos b
       |  JOIN means ma ON ma.i = a.i JOIN means mb ON mb.i = b.i
       |  GROUP BY a.i, b.i),
       |gl AS (SELECT list(gr ORDER BY i) AS rows FROM
       |  (SELECT i, list(g ORDER BY j) AS gr FROM gram GROUP BY i)),
       |v0 AS (SELECT list_transform(generate_series(1, $dim),
       |    i -> 1.0 / sqrt(CAST($dim AS DOUBLE))) AS v),
       |$steps
       |SELECT e.vec_id,
       |  ${fold(s"list_transform(generate_series(1, $dim), j -> (CAST(e.embedding[j] AS DOUBLE) - ml.m[j]) * p.v[j])")} AS pc1
       |FROM embeddings e CROSS JOIN ml CROSS JOIN v$iters p
       |ORDER BY e.vec_id""".stripMargin
  }
}
