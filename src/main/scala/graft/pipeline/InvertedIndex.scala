package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index retrieval over the corpus — the lexical complement of
  * the embedding ANN path (q34/q35/q48): build term postings once, then
  * answer keyword queries with BM25-shaped ranking. This is the shape a
  * corpus-quality team actually queries a 100 TB crawl with ("show me the
  * top pages for <term set>") without ever scanning raw text per query.
  *
  * Scoring is BM25 with k1=1.2, b=0.75 in INTEGER arithmetic (ppk/ppm
  * fixed-point) so an independent engine reproduces every score bit-for-
  * bit: the idf term is the BM25 idf ARGUMENT `(N-df+0.5)/(df+0.5)` kept
  * linear instead of logged (a monotone per-term transform — documented
  * surrogate, not an approximation error), and the tf saturation is the
  * standard `tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))` in parts-per-thousand.
  *
  * Scale shape: the postings build is one explode + content-keyed hash
  * aggregate (the q30/q79 shuffle shape). A query batch broadcasts its
  * terms; only matching postings leave the scan, document lengths join on
  * the doc key (one shuffle proportional to candidates), and top-k is
  * TWO-PHASE: a partial top-k inside 64 hash shards of each query's
  * candidates (parallel, bounded) feeds the global top-k, so no single
  * task ever sorts a popular term's full candidate set — and the result
  * is provably identical to the single-phase window (any global top-k row
  * is in its shard's top-k).
  */
object InvertedIndex {

  /** Postings: one row per (term, doc) with the term frequency. Terms are
    * the non-empty space-separated tokens (the corpus tokenization used
    * by q38/q79).
    */
  def postings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("tf"))

  /** Top-k docs per query. `queries` carries (`qid`, `term`) rows — a
    * query is its term set, weights uniform. Returns (`qid`, `doc_id`,
    * `score`, `rank`) with `rank` 1-based, ties broken by `doc_id` so the
    * result is total-ordered and engine-reproducible.
    */
  def searchTopK(posts: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val lens = posts.groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("dl"))
    val stats = lens.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(col("dl")).cast("long").as("total_dl"))
    val qTerms = queries.select(col("qid"), col("term"))
    val dfQ = posts
      .join(broadcast(qTerms.select("term").distinct()), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
    val cand = posts
      .join(broadcast(qTerms), Seq("term"))
      .join(broadcast(dfQ), Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      // fixed-point products ride decimal(38,0) where they exceed Long at
      // a 10¹²-doc index (dl×N, (N-df)×10⁶×sat); the quotients — ppk
      // norms, ppm idf, per-term contributions — always fit
      .withColumn("norm_ppk",
        expr("250L + (cast(750 AS decimal(38,0)) * dl * n_docs) div total_dl"))
      .withColumn("idf_ppm",
        expr("(cast(2*(n_docs - df) + 1 AS decimal(38,0)) * 1000000) div (2L*df + 1L)"))
      .withColumn("sat_ppk",
        expr("(2200L * tf * 1000L) div (1000L * tf + (1200L * norm_ppk) div 1000L)"))
      .withColumn("contrib",
        expr("(cast(idf_ppm AS decimal(38,0)) * sat_ppk) div 1000"))
    val scored = cand.groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("contrib")).cast("long").as("score"))
    val wLocal = Window.partitionBy(col("qid"), col("__shard"))
      .orderBy(col("score").desc, col("doc_id"))
    val wGlobal = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("__shard", pmod(xxhash64(col("doc_id")), lit(64L)))
      .withColumn("__lr", row_number().over(wLocal)).filter(col("__lr") <= k)
      .withColumn("rank", row_number().over(wGlobal).cast("long")).filter(col("rank") <= k)
      .drop("__shard", "__lr")
  }
}
