package graft

import graft.pipelines.TextAnalysis
import org.apache.spark.sql.functions._

/** Seeded shuffle-sharding, stratified sampling, overlap chunking and the
  * Naive Bayes classifier — structural properties the DuckDB oracles
  * (corpus_shuffle, corpus_sample_stratified, text_chunk_overlap,
  * text_classify_nb) don't pin: partition invariance, coverage, and
  * seed behavior.
  */
class ShuffleClassifySpec extends SparkTestBase {
  import spark.implicits._

  private def docs(n: Int) = spark.range(n).select(
    col("id").as("doc_id"),
    concat(lit("tok"), col("id") % 7, lit(" shared word "),
      lit("x"), col("id") % 3).as("text"),
    when(col("id") % 3 === 0, "de").otherwise("en").as("lang"),
    concat(lit("src"), col("id") % 4).as("source"),
    lit(20L).as("n_chars"))

  test("shuffleShards: dense 0-based positions per shard, all docs present") {
    val out = TextAnalysis.shuffleShards(docs(200), numShards = 4, seed = "s1")
    assert(out.count() == 200)
    val byShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    assert(byShard.length == 4)
    byShard.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L)
      assert(r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
    }
  }

  test("shuffleShards is partition-invariant and seed-sensitive") {
    val d = docs(120)
    val a = TextAnalysis.shuffleShards(d.repartition(1), 4, "s1")
      .select("doc_id", "shard", "pos").collect().toSet
    val b = TextAnalysis.shuffleShards(d.repartition(13), 4, "s1")
      .select("doc_id", "shard", "pos").collect().toSet
    assert(a == b)
    val c = TextAnalysis.shuffleShards(d, 4, "s2")
      .select("doc_id", "shard", "pos").collect().toSet
    assert(a != c)
  }

  test("sampleStratified: rate-1 sources keep everything, rate-0 and absent drop") {
    val out = TextAnalysis.sampleStratified(docs(200),
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0), seed = "s")
    val by = out.groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(by("src0") == 50)                    // every 4th doc, all kept
    assert(by.get("src2").isEmpty && by.get("src3").isEmpty)
    assert(by("src1") > 5 && by("src1") < 45)   // ~half, hash-dependent
    // keep decision is per-doc stable: a subset corpus keeps the same ids
    val sub = TextAnalysis.sampleStratified(docs(100),
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0), seed = "s")
      .select("doc_id").as[Long].collect().toSet
    val full = out.select("doc_id").as[Long].collect().toSet
    assert(sub == full.filter(_ < 100))
  }

  test("chunkOverlap: full coverage, exact stride, shared context") {
    val d = Seq((1L, (1 to 25).map(i => s"w$i").mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.chunkOverlap(d, sizeTokens = 10, overlapTokens = 4)
      .orderBy("chunk_id")
      .select("chunk_id", "tok_start", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
    // stride 6: starts 0, 6, 12, 18 — 18+10 >= 25 ends the walk
    assert(out.map(c => (c._1, c._2, c._3)).toSeq ==
      Seq((0L, 0L, 10L), (1L, 6L, 10L), (2L, 12L, 10L), (3L, 18L, 7L)))
    assert(out.head._4.startsWith("w1 w2"))
    assert(out.last._4 == "w19 w20 w21 w22 w23 w24 w25")
    // consecutive chunks share exactly `overlap` tokens
    val t0 = out(0)._4.split(" ").toSeq
    val t1 = out(1)._4.split(" ").toSeq
    assert(t0.takeRight(4) == t1.take(4))
  }

  test("chunkOverlap: short doc yields exactly one chunk") {
    val d = Seq((1L, "a b c", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.chunkOverlap(d, 10, 4).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_chunk_tokens") == 3L)
  }

  test("naiveBayes recovers class-marker vocabulary") {
    // two classes with disjoint marker tokens plus shared filler
    val d = (0 until 40).map { i =>
      val cls = if (i % 2 == 0) "en" else "de"
      val marker = if (cls == "en") "hello world common speak" else "hallo welt gemein sprech"
      (i.toLong, s"$marker filler$i shared", cls, "s", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.naiveBayes(d, "lang")
    val joined = out.join(d, "doc_id")
      .where(col("predicted") === col("lang")).count()
    assert(joined == 40, "marker-separated classes must classify perfectly")
  }

  test("naiveBayes is partition-invariant") {
    val d = docs(100)
    val a = TextAnalysis.naiveBayes(d.repartition(1), "lang")
      .select("doc_id", "predicted", "score").collect().toSet
    val b = TextAnalysis.naiveBayes(d.repartition(17), "lang")
      .select("doc_id", "predicted", "score").collect().toSet
    assert(a == b)
  }

  test("lmScoreAgainst: unseen bigrams take the smoothed floor, never drop") {
    val train = Seq((1L, "a b", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val probe = Seq((2L, "x y x y x", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.lmScoreAgainst(train, probe)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 1)
    val (_, nBigrams, score) = out.head
    assert(nBigrams == 4L)
    // every probe bigram is unseen: p = (0+1)/(0 + v) with v = 1 ('b' is
    // the only successor in the model) -> avg log prob = ln(1) = 0
    assert(score == 0.0)
  }

  test("lmScoreAgainst(d, d) equals the self-trained lmScore") {
    val d = docs(60)
    val a = TextAnalysis.lmScore(d).collect().toSet
    val b = TextAnalysis.lmScoreAgainst(d, d).collect().toSet
    assert(a == b)
  }

  test("bpeMerges learns the dominant pair and applies passes left-to-right") {
    // 10 copies of "aaaa": round 1 must merge (a,a) with count 30 (three
    // adjacent pairs per word x 10); the BPE pass is left-to-right
    // NON-overlapping, so "aaaa" -> ("aa","aa") and round 2 merges
    // (aa,aa) with count 10 — an overlapping count would report 20.
    val d = (0 until 10).map(i => (i.toLong, "aaaa", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.bpeMerges(d, rounds = 2)
      .orderBy("round")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(out == Seq((1, "a", "a", 30L), (2, "aa", "aa", 10L)))
  }

  test("bpeMerges tie-breaks lexicographically and weights by word frequency") {
    // "xy" x3 + "ab" x3: equal counts -> (a,b) wins the tie
    val d = Seq((1L, "xy xy xy ab ab ab", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.bpeMerges(d, rounds = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(out == Seq((1, "a", "b", 3L)))
  }

  test("zipfFit slope is negative and perplexity bounded by vocabulary") {
    val d = docs(200)
    val z = TextAnalysis.zipfFit(d).collect().head
    assert(z.getAs[Double]("slope") < 0.0, "frequency must fall with rank")
    val p = TextAnalysis.lmPerplexity(d).collect().head
    val ppl = p.getAs[Double]("perplexity")
    assert(ppl >= 1.0 && ppl < 1e6)
  }

  test("collocations rank the always-adjacent pair first") {
    // "alpha beta" always adjacent; "shared" co-occurs with many partners
    val d = (0 until 30).map(i =>
      (i.toLong, s"alpha beta shared tok${i % 6} shared end${i % 5}",
        "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val top = TextAnalysis.collocations(d, minCount = 5L, topK = 5)
      .select("w1", "w2").as[(String, String)].collect()
    assert(top.head == ("alpha", "beta"))
  }

  test("importanceResample upweights the target domain") {
    // two disjoint vocabularies; the en half is the target
    val d = (0 until 80).map { i =>
      val cls = if (i % 2 == 0) "en" else "de"
      val text = if (cls == "en") s"alpha beta gamma delta tok${i % 5}"
                 else s"eins zwei drei vier tok${i % 5}"
      (i.toLong, text, cls, "s", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = TextAnalysis.importanceResample(d, col("lang") === "en")
      .join(d, "doc_id").groupBy("lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // target-domain docs have weight >= 1 (their own LM beats the mixed
    // corpus LM) and must ALL survive the min(w, 1) hash keep
    assert(kept("en") == 40L)
    assert(kept.getOrElse("de", 0L) < 40L)
  }

  test("logistic regression learns a separable boundary to high accuracy") {
    // y = 1 iff x1 > 1.0, margin 0.4 — linearly separable in (x0, x1)
    val feat = spark.range(200).select(
      when(col("id") % 2 === 0, lit(1.0)).otherwise(lit(0.0)).as("y"),
      lit(1.0).as("x0"),
      when(col("id") % 2 === 0,
        lit(1.2) + (col("id") % 7).cast("double") * 0.1)
        .otherwise(lit(0.8) - (col("id") % 7).cast("double") * 0.1).as("x1"),
      lit(0.0).as("x2"), lit(0.0).as("x3"))
    val r = graft.pipelines.TextAnalysis
      .logisticRegressionOn(feat, iters = 60, lr = 4.0).collect().head
    val acc = r.getDouble(4)
    assert(acc >= 0.95, s"separable training accuracy $acc")
    // boundary weight signs: positive slope on x1, negative bias
    assert(r.getDouble(1) > 0 && r.getDouble(0) < 0)
  }

  test("logistic regression gradients are partition-invariant") {
    val docs = spark.range(80).select(
      col("id").as("doc_id"),
      when(col("id") % 3 === 0, "en").otherwise("de").as("lang"),
      concat_ws(" ", (0 to 6).map(i =>
        concat(lit("w"), ((col("id") + i) % 9).cast("string"))): _*).as("text"))
      .withColumn("n_chars", length(col("text")))
    val a = graft.pipelines.TextAnalysis.logisticRegression(
      docs.repartition(1)).collect().head.toSeq
    val b = graft.pipelines.TextAnalysis.logisticRegression(
      docs.repartition(13)).collect().head.toSeq
    assert(a == b)
  }
}
