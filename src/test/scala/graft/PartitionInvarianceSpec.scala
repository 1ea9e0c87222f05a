package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-invariance sweep over the round-9 operators: every result must
  * be byte-identical at 1 partition and at a deliberately awkward 13 —
  * the distribution-correctness property the oracles can't see (DuckDB has
  * no partitions). Operators with their own invariance tests (PCA, HLL,
  * k-means) aren't repeated here. */
class PartitionInvarianceSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = spark.range(60).select(
    col("id").as("doc_id"),
    concat_ws(" ",
      concat(lit("w"), (col("id") % 7).cast("string")),
      concat(lit("w"), (col("id") % 5).cast("string")),
      concat(lit("w"), (col("id") % 3).cast("string")),
      concat(lit("w"), (col("id") % 11).cast("string"))).as("text"))

  private def emb = spark.range(80).select(
    col("id").as("vec_id"),
    transform(sequence(lit(0), lit(7)), i =>
      (sin(col("id") * (i + lit(1)) * 0.7) * 10).cast("float")).as("embedding"))

  private def events = spark.range(300).select(
    (col("id") % 5).as("user_id"),
    (col("id") * 37 % 2000 + col("id")).as("tm"),
    (col("id") % 13).cast("double").as("value"))

  private def same(f: DataFrame => DataFrame, base: DataFrame): Unit = {
    val a = f(base.repartition(1)).collect().map(_.toString).sorted.toSeq
    val b = f(base.repartition(13)).collect().map(_.toString).sorted.toSeq
    assert(a == b, s"partitioning changed the result:\n${a.take(3)}\nvs\n${b.take(3)}")
  }

  test("kcenterCoreset is partition-invariant") {
    same(df => graft.pipelines.Similarity.kcenterCoreset(df, k = 5), emb)
  }

  test("mmrTopK is partition-invariant") {
    same(df => graft.pipelines.Similarity.mmrTopK(df, queryId = 0L, k = 5,
      poolSize = 20), emb)
  }

  test("pq encode is partition-invariant (books fixed)") {
    val books = graft.pipelines.Pq.trainCodebooks(emb, m = 4, ks = 4, dim = 8)
    same(df => graft.pipelines.Pq.encode(df, books, dim = 8)
      .select(col("vec_id"), concat_ws(",",
        transform(col("codes"), _.cast("string"))).as("c")), emb)
  }

  test("cms counters are partition-invariant") {
    same(df => graft.pipelines.Sketches.cmsCounters(
      df.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .withColumn("w", lit(1L)), col("t"), col("w")), docs)
  }

  test("histogram quantiles are partition-invariant") {
    same(df => graft.pipelines.Sketches.histQuantiles(
      graft.pipelines.Sketches.histCounts(df, col("value"), 1.0),
      Seq(0.5, 0.9), 1.0), events)
  }

  test("robustTrend is partition-invariant") {
    same(df => graft.stages.SeriesStats.robustTrend(
      df.select(col("user_id"), col("tm").as("t"), col("value").as("x"))),
      events)
  }

  test("charEntropy is partition-invariant") {
    same(df => graft.pipelines.TextAnalysis.charEntropy(df), docs)
  }

  test("seasonalDecompose is partition-invariant") {
    val daily = spark.range(100).select(
      (col("id") % 4).as("user_id"), (col("id") / 4).as("t"),
      (col("id") % 9).cast("double").as("x"))
    same(df => graft.stages.SeriesStats.seasonalDecompose(df, period = 5,
      keyCol = "user_id"), daily)
  }

  test("oovRate is partition-invariant (and sees injected OOV bigrams)") {
    val withSrc = docs.withColumn("source",
      concat(lit("s"), (col("doc_id") % 2).cast("string")))
    // fresh half gets a doc full of never-seen bigrams
    val fresh = withSrc.where(col("doc_id") % 2 === 1)
      .unionByName(spark.range(1).select(lit(999L).as("doc_id"),
        lit("zz qq zz qq zz").as("text"), lit("s1").as("source")))
    same(df => graft.pipelines.TextAnalysis.oovRate(
      df, fresh, minFreq = 2, bigrams = true),
      withSrc.where(col("doc_id") % 2 === 0))
    val r = graft.pipelines.TextAnalysis.oovRate(
        withSrc.where(col("doc_id") % 2 === 0), fresh,
        minFreq = 2, bigrams = true)
      .where(col("n_oov") > 0).count()
    assert(r > 0)
  }

  test("sampleWeighted is partition-invariant") {
    same(df => graft.pipelines.TextAnalysis.sampleWeighted(
      df.withColumn("n_chars", length(col("text"))), k = 10,
      weightCol = col("n_chars")), docs)
  }

  test("kmv overlap is partition-invariant") {
    same({ df =>
      val skA = graft.pipelines.Sketches.kmvSketch(
        df.where(col("doc_id") % 3 =!= 0), col("text"), Seq.empty, k = 16)
      val skB = graft.pipelines.Sketches.kmvSketch(
        df.where(col("doc_id") % 3 =!= 1), col("text"), Seq.empty, k = 16)
      graft.pipelines.Sketches.kmvOverlap(skA, skB, k = 16)
    }, docs)
  }

  test("prefixJaccardPairs is partition-invariant (and finds pairs)") {
    // ids congruent mod 15 share their middle bigram: J = 1/5 >= 0.2
    same(df => graft.pipelines.Dedup.prefixJaccardPairs(df, n = 2,
      threshold = 0.2), docs)
    assert(graft.pipelines.Dedup.prefixJaccardPairs(docs.repartition(13),
      n = 2, threshold = 0.2).count() > 0)
  }

  test("winnowingPairs is partition-invariant (and finds pairs)") {
    same(df => graft.pipelines.Dedup.winnowingPairs(df, k = 2, w = 2,
      minShared = 1), docs)
    assert(graft.pipelines.Dedup.winnowingPairs(docs.repartition(13),
      k = 2, w = 2, minShared = 1).count() > 0)
  }

  private def evTyped = spark.range(300).select(
    (col("id") % 5).as("user_id"),
    (col("id") * 37 % 2000 + col("id")).as("tm"),
    col("id").as("event_id"),
    concat(lit("t"), (col("id") % 4).cast("string")).as("event_type"))

  test("transitionMatrix is partition-invariant") {
    same(df => graft.stages.TimeJoins.transitionMatrix(df), evTyped)
  }

  test("topPaths is partition-invariant") {
    same(df => graft.stages.TimeJoins.topPaths(df, pathLen = 4, topN = 10),
      evTyped)
  }

  test("containmentPairs is partition-invariant (and finds pairs)") {
    same(df => graft.pipelines.Dedup.containmentPairs(df, n = 2,
      threshold = 0.3), docs)
    assert(graft.pipelines.Dedup.containmentPairs(docs.repartition(13),
      n = 2, threshold = 0.3).count() > 0)
  }

  test("rrf hybrid fusion is partition-invariant") {
    val emb2 = spark.range(60).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)), i =>
        (cos(col("id") * (i + lit(2)) * 0.3) * 5).cast("float")).as("embedding"))
    val a = graft.pipelines.Retrieval.rrfHybridTopK(
        docs.repartition(1), emb2.repartition(1), 0L, 5, pool = 10)
      .collect().map(_.toString).sorted.toSeq
    val b = graft.pipelines.Retrieval.rrfHybridTopK(
        docs.repartition(13), emb2.repartition(7), 0L, 5, pool = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("editDistancePairs is partition-invariant and exact within candidates") {
    // identical texts (dist 0), one-word edits, and far-apart docs
    val d = spark.range(40).select(
      col("id").as("doc_id"),
      concat_ws(" ", lit("alpha beta gamma delta"),
        concat(lit("tail"), (col("id") % 4).cast("string"))).as("text"))
    val cand = d.alias("a").crossJoin(d.alias("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_a"), col("b.doc_id").as("doc_id_b"))
    same(df => graft.pipelines.Dedup.editDistancePairs(df, cand, maxDist = 3), d)
    val r = graft.pipelines.Dedup.editDistancePairs(d, cand, maxDist = 0)
      .collect()
    // ids congruent mod 4 share the exact text: distance 0, similarity 1.0
    assert(r.nonEmpty && r.forall(x =>
      x.getAs[Long]("doc_id_a") % 4 == x.getAs[Long]("doc_id_b") % 4 &&
      x.getAs[Int]("edit_distance") == 0 &&
      x.getAs[Double]("edit_similarity") == 1.0))
  }

  test("sourcePairMatrix is partition-invariant and normalizes pair order") {
    val d = docs.withColumn("source",
      concat(lit("s"), (col("doc_id") % 3).cast("string")))
    val pairs = graft.pipelines.Dedup.ngramJaccardPairs(d, n = 2,
      threshold = 0.3)
    same(df => graft.pipelines.Dedup.sourcePairMatrix(df,
      graft.pipelines.Dedup.ngramJaccardPairs(df, n = 2, threshold = 0.3)), d)
    val r = graft.pipelines.Dedup.sourcePairMatrix(d, pairs).collect()
    assert(r.nonEmpty && r.forall(x =>
      x.getAs[String]("source_a") <= x.getAs[String]("source_b")))
  }

  test("keepTopFractionPerGroup keeps each group's own top fraction") {
    // group g0 scores all above g1; a global 50% floor would keep only g0
    val d = spark.range(40).select(
      col("id").as("doc_id"),
      when(col("id") < 20, "g0").otherwise("g1").as("source"),
      (when(col("id") < 20, lit(100.0)).otherwise(lit(0.0))
        + col("id").cast("double")).as("score"))
    val kept = graft.pipelines.TextAnalysis.keepTopFractionPerGroup(
      d, frac = 0.5, scoreCol = "score", groupCol = "source").collect()
    val byGroup = kept.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    assert(byGroup == Map("g0" -> 10, "g1" -> 10))
    // within each group the TOP half by score survives
    assert(kept.forall(x => x.getAs[Double]("score") >=
      (if (x.getAs[String]("source") == "g0") 110.0 else 30.0)))
    same(df => graft.pipelines.TextAnalysis.keepTopFractionPerGroup(
      df, frac = 0.5, scoreCol = "score", groupCol = "source"), d)
  }

  test("noveltyScores is partition-invariant; novel docs score 1, seen score 0") {
    val ref = docs
    val freshSeen = docs.select(col("doc_id") + 1000, col("text"))
      .toDF("doc_id", "text")
    val freshNew = spark.range(20).select(
      (col("id") + 2000).as("doc_id"),
      concat_ws(" ", concat(lit("zz"), col("id").cast("string")),
        concat(lit("yy"), col("id").cast("string")),
        concat(lit("xx"), col("id").cast("string")),
        concat(lit("vv"), col("id").cast("string"))).as("text"))
    val fresh = freshSeen.unionByName(freshNew)
    same(df => graft.pipelines.Dedup.noveltyScores(df, fresh, n = 2), ref)
    val r = graft.pipelines.Dedup.noveltyScores(ref, fresh, n = 2).collect()
    assert(r.forall { x =>
      val id = x.getAs[Long]("doc_id")
      val nv = x.getAs[Double]("novelty")
      if (id >= 2000) nv == 1.0 else nv == 0.0
    })
  }

  test("rakeKeywords is partition-invariant and scores multiword runs higher") {
    val d = spark.range(30).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        lit("deep learning models"), lit("the"),
        concat(lit("solo"), (col("id") % 5).cast("string")),
        lit("of"), lit("deep learning")).as("text"))
    same(df => graft.pipelines.TextAnalysis.rakeKeywords(df, topK = 3), d)
    val r = graft.pipelines.TextAnalysis.rakeKeywords(d, topK = 1).collect()
    // the repeated multiword run wins every document's top slot
    assert(r.length == 30 &&
      r.forall(_.getAs[String]("phrase") == "deep learning models"))
  }

  test("embeddingOutliers is partition-invariant and cuts per cluster") {
    // 39 near-grid vectors + one far point; a single-member cluster cuts
    // zero rows (floor), larger clusters flag their farthest fifth
    val base = spark.range(40).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(3)), i =>
        (when(col("id") === 39, lit(500.0))
          .otherwise((col("id") % 5).cast("double") * 0.1 + i))
          .cast("float")).as("embedding"))
    same(df => graft.pipelines.Similarity.embeddingOutliers(df, k = 2,
      iters = 2, frac = 0.2), base)
    val r = graft.pipelines.Similarity.embeddingOutliers(base, k = 2,
      iters = 2, frac = 0.2).collect()
    assert(r.nonEmpty)
  }

  test("clusterSilhouette is partition-invariant and bounded in [-1, 1]") {
    same(df => graft.pipelines.Similarity.clusterSilhouette(df, k = 4,
      iters = 2), emb)
    val r = graft.pipelines.Similarity.clusterSilhouette(emb, k = 4, iters = 2)
      .collect()
    assert(r.nonEmpty && r.forall { x =>
      val s = x.getAs[Double]("mean_silhouette")
      s >= -1.0 && s <= 1.0
    })
    // two well-separated blobs score near-perfect silhouette
    val blobs = spark.range(40).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(3)), _ =>
        when(col("id") % 2 === 0, lit(100.0) + (col("id") % 3) * 0.01)
          .otherwise(lit(-100.0) - (col("id") % 3) * 0.01).cast("float"))
        .as("embedding"))
    val b = graft.pipelines.Similarity.clusterSilhouette(blobs, k = 2, iters = 2)
      .collect()
    assert(b.forall(_.getAs[Double]("mean_silhouette") > 0.9))
  }

  test("ivfPqTopK with spill+rerank is partition-invariant") {
    // the round-11 refine levers: the spilled membership, the member dedup
    // and the candidate cut must all be distribution-independent (ADC ties
    // break on id; dedup rows are bit-identical duplicates)
    same(df => graft.pipelines.Pq.ivfPqTopK(df, queryId = 0L, k = 5,
      nProbe = 3, nCentroids = 8, m = 4, ks = 4, rerank = 4, dim = 8,
      spill = 2), emb)
  }

  test("ingest-lag metering is partition-invariant (batch aggregate only)") {
    // the metered sink's per-batch stats are one count/min/max/sum
    // aggregate — partitioning can never move them
    def meter(df: DataFrame): DataFrame = {
      val src = s"inv:${java.util.UUID.randomUUID()}"
      graft.serve.IngestLag.meteredSink(src, tsCol = "tm",
        arrivalClock = _ => 5000L, commitClock = _ => 6000L) {
        (_, _) => ()
      }.apply(df, 0L)
      val out = graft.serve.IngestLag.batches(src).map(b =>
        (b.rows, b.minEventMs, b.maxEventMs, b.coordinatorLagMs,
          b.appendLagMs, b.avgLagMs))
      graft.serve.IngestLag.clear(src)
      import df.sparkSession.implicits._
      out.toDF("rows", "mn", "mx", "clag", "alag", "avg")
    }
    same(meter, events)
  }
}
