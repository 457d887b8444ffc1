package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain-blocklist filtering — the UT1/RefinedWeb curation gate that
  * drops documents by their host BEFORE any content analysis runs (adult,
  * ads, tracker, malware category lists are published as registered-domain
  * and subdomain suffixes). Matching is the DNS convention: a rule
  * `dom.com` covers `dom.com` and every subdomain under it; when several
  * rules cover one host, the MOST SPECIFIC (longest, in labels) wins; a
  * winning rule with category `allow` is a whitelist exception that
  * re-admits the host ("ok.dom.com allow" under "dom.com ads").
  *
  * Scale shape: rule tables are list-sized (UT1's largest category is a
  * few million rows — broadcastable); each host explodes into its label
  * suffixes (bounded by label DEPTH, ≤5 for real hosts, never corpus
  * size), the rule join is a broadcast hash join, and the decision is one
  * id-keyed `max_by(category, nlabels)` aggregation — a single
  * corpus-keyed shuffle, no sort, no window.
  */
object UrlBlocklist {

  /** Verdict per input row: (`idCol`, `category`) where `category` is the
    * most-specific matching rule's category, or `allowed` when no rule
    * matches — or when the winning rule IS an `allow` exception. `rules`
    * carries (`pattern`, `category`) with patterns unique (two rules for
    * one suffix would make the winner undefined).
    */
  def decisions(hosts: DataFrame, rules: DataFrame,
      idCol: String = "doc_id", hostCol: String = "host"): DataFrame = {
    val ids = hosts.select(col(idCol).as("__id"), col(hostCol).as("__host"))
    val sfx = ids.withColumn("suffix", explode(expr(
      "transform(sequence(1, size(split(__host, '[.]'))), " +
        "i -> array_join(slice(split(__host, '[.]'), i, " +
        "size(split(__host, '[.]')) - i + 1), '.'))")))
    // LEFT broadcast join so unmatched hosts keep a row (null category at
    // specificity -1): the verdict is then ONE id-keyed max_by aggregation
    // — no second corpus-sized join to re-attach unmatched ids
    sfx
      .join(broadcast(rules.select(col("pattern").as("suffix"),
        col("category"))), Seq("suffix"), "left")
      .withColumn("nlabels",
        when(col("category").isNull, lit(-1))
          .otherwise(size(split(col("suffix"), "[.]"))))
      .groupBy(col("__id"))
      .agg(expr("max_by(category, nlabels)").as("__cat"))
      .select(col("__id").as(idCol),
        when(col("__cat").isNull || col("__cat") === "allow", lit("allowed"))
          .otherwise(col("__cat")).as("category"))
  }
}
