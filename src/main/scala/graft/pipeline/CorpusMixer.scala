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
    val totals = docs.groupBy(col(stratumCol))
      .agg(sum(col(tokensCol)).cast("long").as("__tok"))
    totals.join(broadcast(weights), Seq(stratumCol))
      .withColumn("__desired", expr(s"($budgetTokens * weight_ppm) div 1000000"))
      .withColumn("rate_ppm",
        least(lit(1000000L), expr("(__desired * 1000000) div __tok")))
      .select(col(stratumCol), col("rate_ppm"))
  }

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
}
