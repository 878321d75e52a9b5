package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Hybrid-retrieval building blocks: the BM25 lexical scorer (doc19's
  * computation, factored for reuse), window-free integer ranks for
  * LIMIT-sized lists, and reciprocal-rank fusion — the operator that
  * joins the engine's two retrieval halves (BM25 postings and ANN)
  * into the ranking a real curation / decontamination / attribution
  * pipeline actually queries.
  *
  * RRF (Cormack, Clarke & Buettcher, SIGIR 2009): score(d) =
  * Σ_lists 1/(c + rank_list(d)), c = 60 — the public standard
  * constant. Rank-based, so the two lists' incomparable score scales
  * (BM25 vs cosine) never need calibration; deterministic, because
  * ranks are integers and the per-document sum adds the two terms in
  * fixed textual order (the doc19 float-sum rule). */
object RetrievalOps {

  /** doc19's BM25 scorer: (doc_id, n_terms_hit, bm25) for a fixed
    * query term set, rational idf ((N − df + 0.5)/(df + 0.5) — same
    * ranking monotonicity as its log, IEEE-exact and engine-portable)
    * and the per-doc total added in SORTED term order (conditional
    * max per term — a float sum() would accumulate in partition
    * order). Scale shape: tf over the exploded token stream filtered
    * to the query terms BEFORE the shuffle; df/avgdl as 1-row /
    * terms-sized broadcasts. */
  def bm25Scores(docs: DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty)
    val toks = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = toks.filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        (col("n_docs").cast("double") - col("df").cast("double") + 0.5) /
          (col("df").cast("double") + 0.5))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("score",
        col("idf") * (col("tf").cast("double") * (k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl").cast("double") / col("avgdl"))))
    def termScore(term: String) = coalesce(
      max(when(col("term") === term, col("score"))), lit(0.0))
    val total = terms.distinct.sorted.map(termScore)
      .reduce(_ + _)
    scored.groupBy(col("doc_id"))
      .agg(total.as("bm25"), count(lit(1)).as("n_terms_hit"))
      .select(col("doc_id"), col("n_terms_hit"), col("bm25"))
  }

  /** The top-`k` of `scores` by (`scoreCol` DESC, doc_id) with
    * EXPLICIT integer ranks — (doc_id, rnk). Deliberately
    * WINDOW-FREE: the global cut is orderBy+limit
    * (TakeOrderedAndProject — distributed), and the rank over the
    * surviving ≤ k rows is 1 + the count of strictly-better rows via
    * a broadcast self-join (k² comparisons of a k-row list — metadata
    * scale). A partition-less rank window would funnel the FULL input
    * through one task; this never ranks more than k rows. Exact
    * row_number equivalence because (score, doc_id) is a total
    * order. */
  def rankedTopK(scores: DataFrame, scoreCol: String,
      k: Int): DataFrame = {
    val top = scores.select(col("doc_id"), col(scoreCol).as("_s"))
      .orderBy(col("_s").desc, col("doc_id")).limit(k)
    val better = top.select(col("doc_id").as("_bid"),
      col("_s").as("_bs"))
    top.join(broadcast(better),
        col("_bs") > col("_s") ||
          (col("_bs") === col("_s") && col("_bid") < col("doc_id")),
        "left")
      .groupBy(col("doc_id"), col("_s"))
      .agg((count(col("_bid")) + 1L).as("rnk"))
      .select(col("doc_id"), col("rnk"))
  }

  /** Reciprocal-rank fusion of a lexical and a semantic ranked list:
    * (doc_id, lex_rnk, sem_rnk, rrf) over the UNION of the lists
    * (full-outer — a document retrieved by one list only contributes
    * that term, the standard convention), rrf = 1/(c+lex) + 1/(c+sem)
    * added in fixed textual order. Both inputs are top-k lists —
    * metadata-sized; the join broadcasts both ways on its own. */
  def rrfFuse(lex: DataFrame, sem: DataFrame,
      c: Int = 60): DataFrame =
    lex.select(col("doc_id"), col("lex_rnk"))
      .join(sem.select(col("doc_id"), col("sem_rnk")),
        Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) /
          (lit(c.toDouble) + col("lex_rnk").cast("double")), lit(0.0)) +
        coalesce(lit(1.0) /
          (lit(c.toDouble) + col("sem_rnk").cast("double")), lit(0.0)))
      .select(col("doc_id"), col("lex_rnk"), col("sem_rnk"),
        col("rrf"))
}
