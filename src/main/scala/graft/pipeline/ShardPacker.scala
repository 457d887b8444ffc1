package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard packing — the step between "sampled corpus" and "files
  * a trainer streams": pack documents greedily into shards of
  * ~`shardTokens` tokens, never splitting a document (the last doc of a
  * shard may overflow the budget — the standard greedy rule, so shard
  * boundaries are a pure function of the ordered token sequence).
  *
  * The packing is deterministic and DISTRIBUTED: docs are packed within
  * an explicit bucket column (the table's layout partition — e.g.
  * `part_bucket`, or an md5 bucket), ordered by an explicit
  * deterministic key, so shard identity is (bucket, local index) — a
  * pure function of (bucket, order, tokens), reproducible across runs,
  * engines, and cluster sizes. The window partitions BY BUCKET: per-
  * partition state is bounded by bucket size (layout-controlled), never
  * the corpus — a single global cumulative sum would serialize 100 TB
  * through one task.
  */
object ShardPacker {

  /** Adds `shard`: the doc's shard index within its bucket. A doc lands
    * in the shard whose budget its PRECEDING bucket-mates filled —
    * `(running_sum_before_doc) div shardTokens`.
    */
  def pack(docs: DataFrame, bucketCol: String, orderCol: String,
      tokensCol: String, shardTokens: Long): DataFrame = {
    // ROWS, not the orderBy-default RANGE frame: RANGE sums order-key
    // PEERS together, which would put tied keys into the same running
    // total and break the one-doc-at-a-time greedy rule
    val w = Window.partitionBy(col(bucketCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("shard", expr(s"(__cum - $tokensCol) div $shardTokens"))
      .drop("__cum")
  }

  /** Context-window packing — the concat-and-chunk pretraining layout
    * (GPT-style): within each bucket, documents are concatenated in
    * `orderCol` order and the token stream is cut every `ctxTokens`
    * tokens; documents may straddle a cut (no padding between docs, waste
    * only in each bucket's final partial sequence). Adds `seq_first` /
    * `seq_last`: the 0-based indexes of the sequences holding the doc's
    * first and last token — `seq_last > seq_first` marks a
    * boundary-crossing doc (the attention-contamination metric a packing
    * report cares about). Distributed exactly like [[pack]]: the running
    * sum partitions BY BUCKET with an explicit ROWS frame, bounded by
    * layout, never a global cumulative sum.
    */
  def packContext(docs: DataFrame, bucketCol: String, orderCol: String,
      tokensCol: String, ctxTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(bucketCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("seq_first", expr(s"(__cum - $tokensCol) div $ctxTokens"))
      // a zero-token doc "occupies" no sequence: pin it to seq_first so it
      // never reads as boundary-crossing
      .withColumn("seq_last",
        expr(s"CASE WHEN $tokensCol > 0 THEN (__cum - 1) div $ctxTokens " +
          s"ELSE (__cum - $tokensCol) div $ctxTokens END"))
      .drop("__cum")
  }
}
