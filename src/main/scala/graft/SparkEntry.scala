package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the main-content extraction pipeline over a deterministic
    * synthetic pages table (the north-rule capability), summarized per url.
    * Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val pages = graft.pipeline.ExtractStage.generatePages(spark, 300, partitions = 8)
    graft.pipeline.ExtractStage.run(pages)
      .select(col("url"), col("success"), col("pattern_used"),
        col("company_name"), col("invoice_number"), col("invoice_date"),
        col("n_products"), col("text_length"))
  }

  /** One entry per implemented operator from SURVEY.md §2 + the
    * training-data ops (dedup / similarity / text analysis) + the
    * extraction pipeline queries.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.queries ++ PagesQueries.queries

  /** DuckDB-equivalent SQL per query (omitted for the non-SQL-expressible
    * extraction ops → driver records a rows-only check for those).
    */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
