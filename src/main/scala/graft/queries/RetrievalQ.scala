package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.pipelines.{Retrieval, Similarity}

/** Lexical retrieval queries: BM25 over the documents corpus, ad-hoc and
  * through the persisted term-bucketed postings index. */
object RetrievalQ extends QueryPack {

  /** Ad-hoc BM25: tokenize → postings → query-term prune → integer-unit
    * score → top-10. Oracle replays the identical floor-quantized math. */
  private def qBm25(s: SparkSession, sf: String): DataFrame =
    Retrieval.bm25TopK(Tables.documents(s, sf), queryId = 0L, k = 10)

  /** Same ranking through the serving-path index (first call of a session
    * builds it): IN-list term probe pushed to the bucketed parquet scan.
    * Shares the ad-hoc oracle — identical output by construction. */
  private def qBm25Indexed(s: SparkSession, sf: String): DataFrame = {
    val table = "graft_bm25_idx_" + sf.replaceAll("[^A-Za-z0-9]", "_")
    Registry.ensureTable(s, table, companions = Seq(s"${table}_stats")) {
      Retrieval.writeBm25Index(Tables.documents(s, sf), table)
    }
    Retrieval.bm25TopKFromIndex(s, table, queryId = 0L, k = 10)
  }

  /** MMR-diversified top-5 from a relevance pool of 50: the redundancy
    * penalty that makes retrieval useful for data selection. Oracle unrolls
    * the greedy into chained CTE steps. */
  private def qMmr(s: SparkSession, sf: String): DataFrame =
    Similarity.mmrTopK(Tables.embeddings(s, sf), queryId = 0L, k = 5)

  /** RRF hybrid: BM25 lexical pool ⊕ exact-cosine semantic pool, fused on
    * reciprocal ranks — the standard hybrid-search combiner. Oracle embeds
    * both existing oracles and replays the fusion arithmetic. */
  private def qRrf(s: SparkSession, sf: String): DataFrame =
    Retrieval.rrfHybridTopK(Tables.documents(s, sf), Tables.embeddings(s, sf),
      queryId = 0L, k = 10)

  /** Pseudo-relevance-feedback expansion: top-5 feedback docs from pass 1
    * donate their 5 best offer-weight terms; pass 2 ranks under the
    * expanded query. Oracle replays both passes and the expansion cut. */
  private def qBm25Prf(s: SparkSession, sf: String): DataFrame =
    Retrieval.bm25PrfTopK(Tables.documents(s, sf), queryId = 0L, k = 10)

  def all: Seq[QueryDef] = Seq(
    QueryDef("retrieval_bm25_prf", qBm25Prf,
      Some(Retrieval.bm25PrfTopKSql(0L, 10))),
    QueryDef("retrieval_bm25", qBm25, Some(Retrieval.bm25TopKSql(0L, 10))),
    QueryDef("retrieval_bm25_indexed", qBm25Indexed, Some(Retrieval.bm25TopKSql(0L, 10))),
    QueryDef("retrieval_mmr", qMmr, Some(Similarity.mmrTopKSql(0L, 5))),
    QueryDef("retrieval_rrf_hybrid", qRrf, Some(Retrieval.rrfHybridTopKSql(0L, 10))))
}
