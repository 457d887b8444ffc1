package graft.core

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the physical-plan properties that matter at 100 TB
  * (parquet filter pushdown, column pruning, join strategy, codegen spans)
  * for each relational query, and flags violations.
  */
object PlanCheckMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val checks: Map[String, (String, String => Boolean)] = Map(
      "q03_filter_pushdown" -> ("parquet PushedFilters non-empty",
        p => p.contains("PushedFilters: [IsNotNull") || p.contains("PushedFilters: [Lt") || p.contains("GreaterThan")),
      "q04_join_broadcast" -> ("BroadcastHashJoin used", _.contains("BroadcastHashJoin")),
      "q05_join_multi" -> ("BroadcastHashJoin used", _.contains("BroadcastHashJoin")),
      "q12_semi_join" -> ("semi join", p => p.contains("LeftSemi")),
      "q06_antijoin_union" -> ("anti join", p => p.contains("LeftAnti")),
      "q01_scan_agg" -> ("partial aggregation", p => p.contains("partial")),
      // round 4: trigram profiles are a vocab-sized table — must broadcast,
      // never shuffle the exploded corpus side into a sort-merge join
      "q76_langid_ngram" -> ("profile join broadcast", _.contains("BroadcastHashJoin")),
      // round 4: the PII scrub is one codegen'd projection over the scan —
      // a join anywhere in its plan would mean the operator stopped being
      // a pure per-row rewrite
      "q75_pii_scrub" -> ("scrub is join-free projection",
        p => !p.split("== Initial Plan ==").head.contains("Join")),
      // round 4 continuation: paragraph dedup is hash-agg + hash-join on
      // the paragraph key — a global window/sort here would serialize the
      // corpus through one partition
      "q79_paragraph_dedup" -> ("no window, no cartesian",
        p => { val f = p.split("== Initial Plan ==").head
          !f.contains("CartesianProduct") && !f.contains("Window") }),
      // the bigram LM is bounded by the fixed-size train sample: its corpus
      // join must broadcast, and the train-id selection must be a
      // distributed top-N (TakeOrderedAndProject), never a full sort
      "q80_lm_quality" -> ("LM broadcast + bounded top-N train sample",
        p => p.contains("BroadcastHashJoin") && p.contains("TakeOrderedAndProject")),
      // per-host gate rates are one projection + one hash agg
      "q81_domain_policy" -> ("gate is join-free projection",
        p => !p.split("== Initial Plan ==").head.contains("Join")),
      // robots decisions are per-row parse+match — join-free by design
      "q83_robots_decision" -> ("robots decision join-free",
        p => !p.split("== Initial Plan ==").head.contains("Join")),
      // substring dedup: per-doc windows only — a single-partition window
      // (or a cartesian) would serialize the corpus
      "q87_substring_dedup" -> ("no cartesian, no global window",
        p => { val f = p.split("== Initial Plan ==").head
          !f.contains("CartesianProduct") && !f.contains("Exchange SinglePartition\n   +- Window") }),
      // round 5: the revisit decision digests bodies in a narrow pass and
      // aggregates a thin key projection — a window or cartesian here
      // would mean the decision stopped being one hash agg + join
      "q92_warc_revisit" -> ("no window, no cartesian",
        p => { val f = p.split("== Initial Plan ==").head
          !f.contains("CartesianProduct") && !f.contains("Window") }),
      // round 5: mixture rates are policy-sized — both the rate join and
      // the weight join must broadcast; the corpus side is never
      // sort-merge-shuffled
      "q93_corpus_mix" -> ("rate joins broadcast, no SMJ on corpus",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("BroadcastHashJoin") && !f.contains("SortMergeJoin") }),
      // round 5: the centroid model is a 1-row broadcast — every join in
      // train/score must be broadcast-shaped, the corpus never
      // key-shuffled
      "q95_quality_centroid" -> ("model joins broadcast-only",
        p => { val f = p.split("== Initial Plan ==").head
          !f.contains("SortMergeJoin") && !f.contains("CartesianProduct") }),
      // round 5b: template detection is two hash aggs + a content-keyed
      // join back; reassembly is per-row array work — a global window or
      // cartesian would serialize the host's pages through one task
      "q97_host_template" -> ("no window, no cartesian",
        p => { val f = p.split("== Initial Plan ==").head
          !f.contains("CartesianProduct") && !f.contains("Window") }),
      // round 5b: epoch rates are policy-sized broadcasts; the corpus is
      // never key-shuffled (the explode multiplies rows, not partitions)
      "q98_epoch_mix" -> ("rate joins broadcast, no SMJ on corpus",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("BroadcastHashJoin") && !f.contains("SortMergeJoin") }),
      // round 5b: query terms and per-term df broadcast into the postings
      // scan; every window is partitioned ((qid) or (qid, shard)) — a
      // partition-less window would pull all candidates to one task
      "q99_bm25_topk" -> ("query joins broadcast, windows partitioned",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("BroadcastHashJoin") &&
            !f.contains("Exchange SinglePartition\n   +- Window") }),
      // round 5b: NFC is one codegen'd projection over the scan
      "q100_unicode_nfc" -> ("nfc is join-free projection",
        p => !p.split("== Initial Plan ==").head.contains("Join")),
      // round 5b: per-host delays broadcast; waves are per-host windows
      "q101_crawl_delay" -> ("delays broadcast, per-host windows only",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("BroadcastHashJoin") && !f.contains("SortMergeJoin") &&
            !f.contains("Exchange SinglePartition\n   +- Window") }),
      // round 5b: the committed-index search has the same shape contract
      // as q99 — it reads the persisted postings instead of building them,
      // but query terms/df still broadcast and no window is partition-less
      "q102_bm25_indexed" -> ("query joins broadcast, windows partitioned",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("BroadcastHashJoin") &&
            !f.contains("Exchange SinglePartition\n   +- Window") }),
      // round 5b: lastmod freshness is one newest-capture agg + one keyed
      // join — never a cartesian, never a global window
      "q103_sitemap_modified" -> ("keyed join only, no cartesian/window",
        p => { val f = p.split("== Initial Plan ==").head
          !f.contains("CartesianProduct") && !f.contains("Window") &&
            !f.contains("BroadcastNestedLoopJoin") }),
      // round 5c: best-member selection is two comp-keyed hash aggs + an
      // equality join back — the q46 shuffle shape, never a window or
      // cartesian (an argmax window here would key on comp anyway; the
      // relational form keeps both engines' tie semantics identical)
      "q104_cluster_canonical" -> ("comp-keyed aggs, no window/cartesian",
        p => { val f = p.split("== Initial Plan ==").head
          !f.contains("CartesianProduct") && !f.contains("Window") &&
            !f.contains("BroadcastNestedLoopJoin") }),
      // round 5c: robots sitemap discovery is one projection + explode
      // over the host table — no join anywhere in the plan
      "q105_robots_sitemaps" -> ("discovery is join-free",
        p => !p.split("== Initial Plan ==").head.contains("Join")),
      // round 5c: change-rate estimation is a per-url window (partitioned
      // — never a single-partition sort of the capture table) + one agg
      "q106_change_priority" -> ("per-url windows only, no cartesian",
        p => { val f = p.split("== Initial Plan ==").head
          !f.contains("CartesianProduct") &&
            !f.contains("Exchange SinglePartition\n   +- Window") }),
      // round 5c: the constant rank filter must plan as WindowGroupLimit —
      // per-task top-cap pruning BEFORE the shuffle is the whole scale
      // story of a per-host cap (a mega-host never moves its full pages)
      "q107_host_cap" -> ("WindowGroupLimit pre-prunes, window partitioned",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("WindowGroupLimit") &&
            !f.contains("Exchange SinglePartition\n   +- Window") }),
      // round 5c: fielded search keeps q99's contract per field — query
      // terms/df broadcast, every window partitioned — and the field
      // combine is a keyed join, never a cartesian
      "q108_bm25_fielded" -> ("broadcast terms, keyed combine, windows partitioned",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("BroadcastHashJoin") && !f.contains("CartesianProduct") &&
            !f.contains("Exchange SinglePartition\n   +- Window") }),
      // round 5c: the two exact-percentile cutoffs ride a 1-row broadcast
      // into a codegen'd filter — no sort, no window, no corpus shuffle
      // beyond the percentile aggregation itself
      "q109_length_trim" -> ("cutoffs broadcast, no window/sort on corpus",
        p => { val f = p.split("== Initial Plan ==").head
          !f.contains("SortMergeJoin") && !f.contains("Window") &&
            f.contains("BroadcastNestedLoopJoin") }),
      // round 5d: phrase terms broadcast into ONE positional-token scan;
      // anchor/occurrence aggregations are content-keyed; ranking windows
      // stay partitioned — no token-stream self-join, no corpus window
      "q110_phrase_search" -> ("phrases broadcast, windows partitioned",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("BroadcastHashJoin") && !f.contains("CartesianProduct") &&
            !f.contains("SortMergeJoin") &&
            !f.contains("Exchange SinglePartition\n   +- Window") }),
      // round 5d: the rule table broadcasts (LEFT outer keeps unmatched
      // hosts); the verdict is ONE id-keyed max_by aggregation — no
      // corpus-sized join back, no window, no sort
      "q111_url_blocklist" -> ("rules broadcast, single corpus agg",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("BroadcastHashJoin") && !f.contains("SortMergeJoin") &&
            !f.contains("Window") }),
      // round 5d: the packing cumsum partitions BY BUCKET — a
      // partition-less window would serialize the corpus through one task
      "q112_context_packing" -> ("packing windows partitioned by bucket",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("Window") &&
            !f.contains("Exchange SinglePartition\n   +- Window") }),
      // round 5e: tf-idf ranks ride PER-DOC windows; the corpus-stats
      // scalar is a 1-row broadcast; df joins on the term key
      "q113_tfidf_keywords" -> ("per-doc windows, scalar stats broadcast",
        p => { val f = p.split("== Initial Plan ==").head
          !f.contains("CartesianProduct") &&
            !f.contains("Exchange SinglePartition\n   +- Window") }),
      // round 5e: adjacency windows are per-doc; the top-15 must plan as
      // TakeOrderedAndProject (per-partition top-k + merge), never a
      // global Sort of the collocation table
      "q114_pmi_collocations" -> ("per-doc windows, top-k not global sort",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("TakeOrderedAndProject") &&
            !f.contains("Exchange SinglePartition\n   +- Window") }),
      // round 5e: trap detection is two hash aggregations — no join, no
      // window anywhere
      "q115_crawler_traps" -> ("two hash aggs, join-free, window-free",
        p => { val f = p.split("== Initial Plan ==").head
          !f.contains("Join") && !f.contains("Window") }),
      // round 5f: the PR sweep aggregates the corpus to ≤1001 distinct-
      // score rows BEFORE its ordered window (q07 discipline); the only
      // joins are 1-row broadcasts
      "q116_pr_curve" -> ("aggregate-then-window, scalar broadcast only",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("HashAggregate") && !f.contains("SortMergeJoin") &&
            !f.contains("CartesianProduct") }),
      // round 5f: drift is two term aggs + one vocab-keyed join; both
      // direction cuts are TakeOrderedAndProject, and there is no window
      "q117_corpus_drift" -> ("top-k cuts not global sorts, window-free",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("TakeOrderedAndProject") && !f.contains("Window") }),
      // round 5f: spectrum = term-frequency agg → ≤64 bucket rows →
      // window; scalar total rides a 1-row broadcast
      "q118_freq_spectrum" -> ("aggregate-then-window, scalar broadcast only",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("HashAggregate") && !f.contains("SortMergeJoin") &&
            !f.contains("CartesianProduct") }),
      // round 5f: the funnel's verdict and cutoff tables broadcast; the
      // only corpus-keyed join is the dedup attribution itself; no window
      "q119_curation_funnel" -> ("verdicts/cutoffs broadcast, no window",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("BroadcastHashJoin") && !f.contains("CartesianProduct") &&
            !f.contains("Window") }),
      // round 5g: SemDeDup's candidate discipline — centroid assignment is
      // a C-row broadcast, pairs join on the CLUSTER key; never all-pairs,
      // never a window
      "q120_semdedup" -> ("cluster-keyed pairs, no cartesian, window-free",
        p => { val f = p.split("== Initial Plan ==").head
          !f.contains("CartesianProduct") && !f.contains("Window") }),
      // round 5g: both DSIR rate tables are exactly 256 rows — the score
      // join must broadcast, and the top-20 must be a distributed top-N
      "q121_dsir_select" -> ("rate tables broadcast, top-k not global sort",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("BroadcastHashJoin") && f.contains("TakeOrderedAndProject") &&
            !f.contains("SortMergeJoin") }),
      // round 5g: the CM sketch is 48 cells — its probe join must
      // broadcast; the heavy-hitter cut is a distributed top-N; no window
      "q122_countmin_hh" -> ("sketch broadcast, top-k not global sort",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("BroadcastHashJoin") && f.contains("TakeOrderedAndProject") &&
            !f.contains("Window") }),
      // round 5g: HLL = two hash aggs (register max, then the 1-row fold)
      // + a 1-row broadcast for the truth column — no window, no SMJ, no
      // key-shuffled join anywhere
      "q123_hll_distinct" -> ("two aggs + 1-row broadcast, window-free",
        p => { val f = p.split("== Initial Plan ==").head
          !f.contains("SortMergeJoin") && !f.contains("Window") &&
            !f.contains("CartesianProduct") }),
      // round 5h: PQ's scale contract — the query distance tables join the
      // corpus-side CODE table as broadcasts; never a cartesian (the only
      // cross shape is the C-row codebook broadcast inside the trainer)
      "q124_pq_adc" -> ("distance tables broadcast onto the code scan",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("BroadcastHashJoin") && !f.contains("CartesianProduct") }),
      // round 5h: the sketch is ≤64 cells built by hash aggregation; every
      // window runs AFTER aggregation (bin/length tables, never the corpus)
      "q125_quantile_sketch" -> ("aggregate-then-window, no cartesian",
        p => { val f = p.split("== Initial Plan ==").head
          f.contains("HashAggregate") && !f.contains("CartesianProduct") }))

    graft.Queries.all.foreach { q =>
      val df = q.fn(spark, sfDir)
      // execute the plan itself (not a derived count) so AQE settles on
      // the FINAL physical plan — before execution the adaptive plan
      // string hides join choices and WholeStageCodegen spans
      try df.queryExecution.executedPlan.execute().count()
      catch { case _: Throwable => () }
      val plan = df.queryExecution.executedPlan.toString
      val formatted = try {
        val sw = new java.io.StringWriter()
        sw.append(org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan))
        sw.toString
      } catch { case _: Throwable => "" }

      // audit the FINAL (post-AQE) plan half only — the Initial Plan
      // section repeats every operator and would double-count
      val finalHalf = plan.split("== Initial Plan ==").head
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(finalHalf).toList.distinct
      val readSchema = "ReadSchema: [^,\n]*".r.findFirstIn(finalHalf).getOrElse("")
      val joins = List("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct").filter(finalHalf.contains)
      // whole-stage codegen shows as "*(n)" operator prefixes; count
      // DISTINCT stage ids
      val nWsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(finalHalf).map(_.group(1)).toSet.size
      val exchanges = "Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition".r
        .findAllIn(finalHalf).length

      println(s"=== ${q.name}")
      println(s"  joins=$joins exchanges=$exchanges codegenSpans=$nWsc")
      if (pushed.nonEmpty) println(s"  ${pushed.mkString("; ").take(200)}")
      if (readSchema.nonEmpty) println(s"  $readSchema".take(220))
      checks.get(q.name).foreach { case (desc, pred) =>
        println(s"  CHECK[$desc]: ${if (pred(plan)) "PASS" else "FAIL"}")
      }
      val _ = formatted
    }
    spark.stop()
  }
}
