package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-budget corpus mixing — the release step every LLM training run
  * puts between "curated corpus" and "training shards" (Dolma's source
  * mixing, RedPajama's per-slice weights, The Pile's epochs-per-subset):
  * given per-stratum target shares of a global token budget, derive a
  * per-stratum ACCEPT RATE and take a deterministic hash-sample at that
  * rate, so the sampled mixture hits `weight × budget` tokens per stratum
  * in expectation.
  *
  * Everything is integer parts-per-million arithmetic on content-derived
  * md5 buckets (the q73 pattern) — the sample is a pure function of
  * (doc_id, rates), reproducible across engines, runs, and cluster sizes,
  * and any slice of the corpus can be sampled independently (no global
  * state, no RNG sequence to coordinate across executors).
  *
  * Scale shape: one map-side-combined aggregation to stratum token totals
  * (stratum cardinality is policy-sized — languages × quality buckets),
  * a broadcast of the rate table, and a codegen'd filter. The corpus is
  * never shuffled; an oversubscribed stratum (`weight × budget` larger
  * than the stratum) caps at keep-everything rather than inventing data.
  */
object CorpusMixer {

  /** Per-stratum accept rates (ppm): `rate = min(1, budget·weight/tokens)`.
    * `weights` carries (`stratumCol`, `weight_ppm`); strata absent from it
    * get no rate and sample to zero (inner-join semantics — an unlisted
    * source is excluded from the mixture by construction, the Dolma rule).
    */
  def rates(docs: DataFrame, stratumCol: String, weights: DataFrame,
      budgetTokens: Long, tokensCol: String): DataFrame = {
    // a zero-token stratum has nothing to sample — excluded like an
    // unlisted one (without the filter, div-by-zero NULLs through
    // least() as keep-EVERYTHING here but drop-everything in epochRates)
    val totals = docs.groupBy(col(stratumCol))
      .agg(sum(col(tokensCol)).cast("long").as("__tok"))
      .filter(col("__tok") > 0)
    // products ride decimal(38,0): budget×weight and desired×10⁶ exceed
    // Long at ~10¹³ corpus tokens (the quotients always fit — `div`
    // truncates the decimal product exactly, probed in this codebase)
    totals.join(broadcast(weights), Seq(stratumCol))
      .withColumn("__desired",
        expr(s"(cast($budgetTokens AS decimal(38,0)) * weight_ppm) div 1000000"))
      .withColumn("rate_ppm",
        least(lit(1000000L),
          expr("(cast(__desired AS decimal(38,0)) * 1000000) div __tok")))
      .select(col(stratumCol), col("rate_ppm"))
  }

  /** Epoch rates for UP-sampling mixes (The Pile's epochs-per-subset,
    * the Llama data recipes): like [[rates]] but UNCAPPED — a stratum
    * whose desired share exceeds its size gets `rate_ppm > 1,000,000`,
    * i.e. more than one training epoch of it. The budget is expressed as
    * a share of the whole corpus (`budgetSharePpm` of total tokens,
    * derived relationally from a 1-row aggregate — no driver collect),
    * so the policy scales with the data instead of hard-coding a token
    * count. Unlisted strata keep inner-join exclusion semantics.
    */
  def epochRates(docs: DataFrame, stratumCol: String, weights: DataFrame,
      budgetSharePpm: Long, tokensCol: String): DataFrame = {
    val totals = docs.groupBy(col(stratumCol))
      .agg(sum(col(tokensCol)).cast("long").as("__tok"))
      .filter(col("__tok") > 0) // zero-token stratum: see [[rates]]
    val grand = totals.agg(sum(col("__tok")).cast("long").as("__grand"))
    // decimal(38,0) products for the same reason as [[rates]]: grand×share
    // is ~6×10¹⁹ at a 100 TB corpus — far past Long — while every quotient
    // (desired tokens, ppm rates) fits comfortably
    totals.join(broadcast(weights), Seq(stratumCol))
      .crossJoin(broadcast(grand))
      .withColumn("__desired", expr(
        s"cast((cast(__grand AS decimal(38,0)) * $budgetSharePpm) div 1000000 " +
          "AS decimal(38,0)) * weight_ppm div 1000000"))
      .withColumn("rate_ppm",
        expr("(cast(__desired AS decimal(38,0)) * 1000000) div __tok"))
      .select(col(stratumCol), col("rate_ppm"))
  }

  /** Deterministic copy counts under an epoch mix: every doc gets
    * `rate_ppm div 10⁶` full epochs, plus one more iff its md5 bucket
    * falls below the fractional remainder — so the stratum lands on
    * `weight × budget` tokens in expectation while staying a pure
    * function of (id, rates).
    */
  def copyCounts(docs: DataFrame, stratumCol: String, weights: DataFrame,
      budgetSharePpm: Long, idCol: String = "doc_id",
      tokensCol: String = "n_tokens"): DataFrame = {
    val r = epochRates(docs, stratumCol, weights, budgetSharePpm, tokensCol)
    docs.join(broadcast(r), Seq(stratumCol))
      .withColumn("__sel", pmod(
        expr(s"cast(conv(substr(md5(cast($idCol AS string)), 1, 8), 16, 10) AS BIGINT)"),
        lit(1000000L)))
      .withColumn("n_copies",
        expr("rate_ppm div 1000000") +
          when(col("__sel") < pmod(col("rate_ppm"), lit(1000000L)), 1L).otherwise(0L))
      .drop("__sel")
  }

  /** The up-sampled corpus itself: one row per (doc, copy) with a 0-based
    * `copy` index — what shard packing consumes for a multi-epoch source.
    * Scale shape: the explode multiplies rows (that IS the semantics) but
    * introduces no shuffle; rates arrive by broadcast.
    */
  def upsample(docs: DataFrame, stratumCol: String, weights: DataFrame,
      budgetSharePpm: Long, idCol: String = "doc_id",
      tokensCol: String = "n_tokens"): DataFrame =
    copyCounts(docs, stratumCol, weights, budgetSharePpm, idCol, tokensCol)
      .filter(col("n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("n_copies") - 1)))

  /** The mixture sample: input rows plus `rate_ppm` and a deterministic
    * `kept` flag — doc selected iff its md5 bucket (of `idCol`, over 10⁶)
    * falls below the stratum's rate. Callers filter on `kept` for the
    * shard set, or aggregate over it for mixture accounting.
    */
  def sample(docs: DataFrame, stratumCol: String, weights: DataFrame,
      budgetTokens: Long, idCol: String = "doc_id",
      tokensCol: String = "n_tokens"): DataFrame = {
    val r = rates(docs, stratumCol, weights, budgetTokens, tokensCol)
    docs.join(broadcast(r), Seq(stratumCol))
      .withColumn("__sel", pmod(
        expr(s"cast(conv(substr(md5(cast($idCol AS string)), 1, 8), 16, 10) AS BIGINT)"),
        lit(1000000L)))
      .withColumn("kept", col("__sel") < col("rate_ppm"))
      .drop("__sel")
  }

  /** Domain balancing (the RefinedWeb/FineWeb per-host cap): at most
    * `cap` rows per key survive, chosen in `order` — callers pass a
    * deterministic total order (e.g. md5-of-id for an unbiased sample,
    * quality-desc for best-first; ALWAYS end with a unique tiebreaker, or
    * ties make the kept set partition-order-dependent). A boilerplate
    * farm with 10⁹ pages contributes `cap` docs, same as a blog.
    *
    * Scale shape: one window PARTITIONED BY key — and because the rank
    * filter is a constant, Spark plans it as WindowGroupLimit: each task
    * pre-prunes to its local top-`cap` per key BEFORE the shuffle, so a
    * mega-host moves O(tasks × cap) rows, never its full page set.
    */
  def capPerKey(docs: DataFrame, keyCol: String, cap: Int,
      order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(order: _*)
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }
}
