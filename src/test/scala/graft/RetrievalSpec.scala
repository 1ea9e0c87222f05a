package graft

import graft.pipelines.Retrieval

/** BM25 retrieval contract: hand-computed scores on a tiny corpus, ad-hoc ==
  * indexed serving path, and the probe plan's two scale properties (IN-list
  * pushed to the index scan; ranking is a distributed TakeOrdered, not a
  * global sort). */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark query engine"),
    (1L, "spark spark spark all about spark"),
    (2L, "a distributed query engine for big data"),
    (3L, "spark query engine spark query engine"),
    (4L, "nothing relevant here at all")).toDF("doc_id", "text")

  /** Reference BM25 re-derivation, same floor-quantization as the engine. */
  private def expectedUnits(): Map[Long, Long] = {
    val toks = Map(
      0L -> Seq("spark", "query", "engine"),
      1L -> Seq("spark", "spark", "spark", "all", "about", "spark"),
      2L -> Seq("a", "distributed", "query", "engine", "for", "big", "data"),
      3L -> Seq("spark", "query", "engine", "spark", "query", "engine"),
      4L -> Seq("nothing", "relevant", "here", "at", "all"))
    val n = toks.size.toLong
    val sumLen = toks.values.map(_.size.toLong).sum
    val qTerms = toks(0L).distinct
    val df = qTerms.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    (for {
      (d, ts) <- toks if d != 0L
      scores = qTerms.flatMap { t =>
        val tf = ts.count(_ == t).toLong
        if (tf == 0) None
        else {
          val idfU = math.floor(math.log(
            1.0 + (n.toDouble - df(t) + 0.5) / (df(t).toDouble + 0.5)) * 1e9).toLong
          val r = ts.size.toDouble * n / sumLen
          val tff = tf.toDouble * (Retrieval.K1 + 1.0) /
            (tf.toDouble + Retrieval.K1 * ((1.0 - Retrieval.B) + Retrieval.B * r))
          Some(math.floor(idfU.toDouble * tff).toLong)
        }
      }
      if scores.nonEmpty
    } yield d -> scores.sum).toMap
  }

  test("bm25TopK matches the hand-derivation and ranks by integer units") {
    val got = Retrieval.bm25TopK(docs, queryId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val want = expectedUnits()
    assert(got.map(_._1).toSet == want.keySet.filter(want(_) != 0L) ||
      got.map(_._1).toSet == want.keySet,
      s"result docs ${got.map(_._1).toSet} vs expected ${want.keySet}")
    got.foreach { case (d, s, _) =>
      assert(math.abs(s - want(d) / 1e9) < 1e-12, s"doc $d: $s vs ${want(d) / 1e9}")
    }
    // rank order = units desc, doc_id asc
    val sortedWant = want.toSeq.sortBy { case (d, u) => (-u, d) }.map(_._1)
    assert(got.sortBy(_._3).map(_._1).toSeq == sortedWant)
    // doc 3 repeats every query term twice: must outrank the spark-only doc 1
    assert(got.find(_._1 == 3L).get._3 < got.find(_._1 == 1L).get._3)
  }

  test("indexed serving path matches ad-hoc, pushes the term IN-list, ranks via TakeOrdered") {
    val table = "graft_test_bm25_idx"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_stats")
    Retrieval.writeBm25Index(docs, table, buckets = 4)

    val fromIndex = Retrieval.bm25TopKFromIndex(spark, table, queryId = 0L, k = 10)
    val adhoc = Retrieval.bm25TopK(docs, queryId = 0L, k = 10)
    assert(fromIndex.collect().toSeq == adhoc.collect().toSeq)

    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"probe ranking must be a distributed TakeOrdered:\n$plan")
    assert(plan.contains("In(term,"),
      s"query terms must push into the index scan as an IN filter:\n$plan")

    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_stats")
  }

  test("rrf fuses lexical and semantic ranks, both-list hits outrank single-list") {
    // doc 1: strong in BOTH lists; doc 2: lexical-only; doc 3: semantic-only.
    // Text overlap drives BM25; embeddings drive cosine.
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta gamma extra"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "unrelated words entirely different")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.05f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 0.1f))).toDF("vec_id", "embedding")
    val got = Retrieval.rrfHybridTopK(docs, emb, queryId = 0L, k = 3, pool = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .sortBy(_._3)
    // doc 1 is rank 1/2 in both pools → two reciprocal terms; 2 and 3 get one
    assert(got.head._1 == 1L, got.mkString(","))
    val fused = got.map(g => g._1 -> g._2).toMap
    assert(fused(1L) > fused.getOrElse(2L, 0.0) &&
      fused(1L) > fused.getOrElse(3L, 0.0))
    // every emitted rrf equals 1/(60+lr) + 1/(60+sr) for some ranks <= pool
    got.foreach { case (_, s, _) =>
      val singles = (1 to 2).map(r => 1.0 / (60.0 + r))
      val doubles = for (a <- singles; b <- singles) yield a + b
      assert((singles ++ doubles).exists(v => math.abs(v - s) < 1e-15), s"odd rrf $s")
    }
  }

  test("mmrTopK ranks by pure relevance first, then trades it against redundancy") {
    // query 0 = (1,0); 1 is a near-copy of the best hit 2; 3 is orthogonal-ish.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.02f)),
      (1L, Array(1.0f, 0.03f)),
      (3L, Array(0.6f, -0.8f))).toDF("vec_id", "embedding")

    // lambda=1: pure relevance order (2 edges out 1, then 3).
    val pure = graft.pipelines.Similarity.mmrTopK(emb, queryId = 0L, k = 3, lambda = 1.0)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(pure.sortBy(_._2).map(_._1).toSeq == Seq(2L, 1L, 3L), pure.mkString(","))

    // lambda=0.5: the near-copy 1 is penalized by sim(1,2)~1, the diverse 3 wins rank 2.
    val div = graft.pipelines.Similarity.mmrTopK(emb, queryId = 0L, k = 3, lambda = 0.5)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(div.sortBy(_._2).map(_._1).toSeq == Seq(2L, 3L, 1L), div.mkString(","))

    // rank 1 is ALWAYS the max-relevance item regardless of lambda.
    assert(div.find(_._2 == 1).get._1 == 2L)
  }

  test("PRF expansion retrieves a doc sharing NO query terms (recall lift)") {
    // query 0 matches bridge doc 1 on "alpha beta"; doc 1's other terms
    // "gamma delta" match doc 2, which shares NOTHING with the query.
    // Filler docs keep the expansion terms' idf meaningful.
    val corpus = (Seq(
      (0L, "alpha beta"),
      (1L, "alpha beta gamma delta"),
      (2L, "gamma delta epsilon zeta")) ++
      (3L to 9L).map(i => (i, s"filler$i junk$i noise$i"))).toDF("doc_id", "text")
    val base = Retrieval.bm25TopK(corpus, queryId = 0L, k = 9)
      .collect().map(_.getLong(0)).toSet
    assert(!base.contains(2L), s"base BM25 should not reach doc 2: $base")
    val prf = Retrieval.bm25PrfTopK(corpus, queryId = 0L, k = 9,
      feedbackK = 1, expandM = 2)
      .collect().map(_.getLong(0)).toSet
    assert(prf.contains(2L), s"PRF should reach doc 2 via expansion: $prf")
    // rank 1 stays the direct match in both passes
    val top = Retrieval.bm25PrfTopK(corpus, queryId = 0L, k = 1,
      feedbackK = 1, expandM = 2).collect().head
    assert(top.getLong(0) == 1L)
  }
}
