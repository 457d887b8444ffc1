package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The composed training-data pipeline: extract → quality gate → near-dup
  * clustering → keep/drop → a committed, queryable KEPT corpus.
  *
  * The reference's whole point is that extraction results land in a store
  * every endpoint queries (/root/reference/app.py:81-90); a training-data
  * pipeline's whole point is that the *deduplicated* corpus is the product.
  * This object composes the pieces that already exist —
  * [[ExtractPipeline.run]] (committed extract table),
  * [[Dedup.minhashClusterLabels]] (cluster labels), min-id canonical
  * keep — into one resumable job with the same manifest/lineage protocol
  * and the same `(part_bucket, warc_day)` hidden-partition layout as the
  * extract table.
  *
  * Keep rule: within each duplicate cluster the canonical doc is the one
  * whose id equals the component label (= min id in the cluster);
  * everything else is dropped. Docs too short to shingle (<3 words) have
  * no signature and are kept as trivially-unique singletons.
  *
  * Resume: the dedup decision is GLOBAL (labels depend on the whole
  * corpus), so a resumed run recomputes labels over the full input — which
  * is deterministic, so the keep set is identical and only the buckets
  * missing from the manifest are (re)written. At 100 TB label recompute is
  * the safe default; a deployment that wants to skip it can persist
  * `labels` as its own table and pass it back via `precomputedLabels`.
  */
object CuratedPipeline {

  /** Curate an arbitrary corpus into a committed kept-corpus table.
    *
    * @param corpus  must carry `idCol` (long, unique), `textCol` (string),
    *                `url` (string) and `warc_ts` (timestamp); all other
    *                columns pass through to the kept table
    * @param precomputedLabels (id, comp) labels to reuse (e.g. a
    *                materialized labels table, or the analysis queries'
    *                session cache) instead of re-clustering
    * @param canonicalCol when set, docs sharing this column's value (a
    *                `<link rel=canonical>` target) cluster together even
    *                with unrelated text — the site-declared dup signal,
    *                resolved in the same components pass as content LSH
    * @return lineage rows of THIS run (kept rows per partition)
    */
  def run(spark: SparkSession, corpus: DataFrame, outDir: String,
      idCol: String = "id", textCol: String = "text",
      numBuckets: Int = 32, snapshotGroups: Int = 4,
      runId: String = "curate",
      precomputedLabels: Option[DataFrame] = None,
      canonicalCol: Option[String] = None,
      reliable: Boolean = false): Seq[LineageRow] = {

    val done = ExtractPipeline.committedBuckets(outDir)
    val remaining = (0 until numBuckets).filterNot(done)
    if (remaining.isEmpty) return Seq.empty

    val labels = precomputedLabels.getOrElse(
      Dedup.clusterLabels(corpus, idCol, textCol, canonicalCol, reliable))
      .select(col("id").as("__cid"), col("comp").as("__comp"))

    // keep = canonical doc per cluster (id == comp) ∪ unlabeled short docs.
    // LEFT join because labels cover only the ≥3-word subset; the join is a
    // plain shuffle hash join on the doc id — labels are (id, comp) pairs,
    // a sliver of the corpus width, so this stays cheap at corpus scale.
    val kept = corpus
      .join(labels, col(idCol) === col("__cid"), "left")
      .filter(col("__comp").isNull || col("__comp") === col(idCol))
      .drop("__cid", "__comp")
      .withColumn("part_bucket", pmod(xxhash64(col("url")), lit(numBuckets)).cast("int"))
      .withColumn("warc_day", to_date(col("warc_ts")))

    val groups = remaining.grouped(
      math.max(1, (numBuckets + snapshotGroups - 1) / snapshotGroups)).toSeq
    val allLineage = scala.collection.mutable.ArrayBuffer.empty[LineageRow]

    groups.zipWithIndex.foreach { case (buckets, gi) =>
      val snapshotId = f"snap-$runId-$gi%03d"
      val acc = spark.sparkContext.collectionAccumulator[LineageRow](s"lineage-$snapshotId")
      val slice = kept.filter(col("part_bucket").isin(buckets.map(Integer.valueOf): _*))
        // co-locate each bucket in one task (one output file per bucket)
        .repartition(buckets.length, col("part_bucket"))

      val textIdx = slice.schema.fieldIndex(textCol)
      val counted: Dataset[Row] = slice.mapPartitions { it =>
        val t0 = System.nanoTime()
        var rows = 0L; var bytes = 0L
        var reported = false
        val out = it.map { r =>
          rows += 1
          val t = if (r.isNullAt(textIdx)) null else r.getString(textIdx)
          bytes += (if (t == null) 0 else t.length)
          r
        }
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h && !reported) {
              reported = true
              acc.add(LineageRow(runId, snapshotId,
                org.apache.spark.TaskContext.getPartitionId(), rows, rows, 0L,
                bytes, (System.nanoTime() - t0) / 1000000, "committed"))
            }
            h
          }
          def next(): Row = out.next()
        }
      }(Encoders.row(slice.schema))

      counted.write.mode(SaveMode.Overwrite)
        .partitionBy("part_bucket", "warc_day")
        // scoped dynamic overwrite: a torn group's rewrite replaces exactly
        // its buckets (same protocol as ExtractPipeline)
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", "zstd")
        .option("parquet.block.size", (16 * 1024 * 1024).toString)
        .parquet(s"$outDir/data")

      import scala.jdk.CollectionConverters._
      val lineage = acc.value.asScala.toSeq
        .groupBy(_.partition_id).map(_._2.head).toSeq.sortBy(_.partition_id)
      ExtractPipeline.appendManifest(outDir, runId, snapshotId, buckets, lineage)
      allLineage ++= lineage
    }
    allLineage.toSeq
  }

  /** The flagship composition over raw pages, staged exactly as a 100 TB
    * deployment would run it:
    *
    *   1. extract → committed extract table at `outDir/extract`
    *      ([[ExtractPipeline.run]] — resumable, lineage'd)
    *   2. read the extract table → quality gate → dedup →
    *      committed KEPT corpus at `outDir/curated` (this object — also
    *      resumable, lineage'd)
    *
    * Staging through the committed extract table means extraction runs
    * exactly once per page no matter how many snapshot groups the curate
    * stage writes (each group re-SCANS kept rows from parquet, never
    * re-extracts), and a kill at any point resumes from whichever stage's
    * manifest is incomplete.
    *
    * @param minTextLength quality gate: extracted docs shorter than this
    *                      never reach dedup
    * @param minQuality    quality gate: minimum `GraftFunctions.qualityScore`
    *                      (the q37 signals — length, alpha ratio, stopword
    *                      density — as one [0,1] number). 0.0 = length/
    *                      success gating only (the score column is skipped
    *                      entirely so the default path pays nothing).
    * @param honorNoindex  drop pages whose head carried a robots
    *                      `noindex`/`none` directive before dedup — the
    *                      site owner's opt-out, which responsible
    *                      training-data pipelines honor. A dropped-for-
    *                      noindex page also never serves as a cluster
    *                      canonical (it is gone before labels form).
    * @param clusterByCanonical feed the `<link rel=canonical>` column into
    *                      the components pass, so site-declared duplicate
    *                      groups merge with content near-dup clusters
    * @return (extract-stage lineage, curate-stage lineage) for THIS run
    */
  def runFromPages(spark: SparkSession, pages: Dataset[Page], outDir: String,
      numBuckets: Int = 32, snapshotGroups: Int = 4, runId: String = "curate",
      minTextLength: Int = 1, minQuality: Double = 0.0,
      honorNoindex: Boolean = true, clusterByCanonical: Boolean = true,
      reliable: Boolean = false): (Seq[LineageRow], Seq[LineageRow]) = {
    val extractLineage = ExtractPipeline.run(spark, pages, s"$outDir/extract",
      numBuckets, snapshotGroups, runId)
    val extracted = ExtractPipeline.readOutput(spark, s"$outDir/extract")
    val gated = extracted
      .filter(col("success") && col("text_length") >= minTextLength)
      .filter(if (honorNoindex) !col("noindex") else lit(true))
      .filter(
        if (minQuality <= 0.0) lit(true)
        else graft.functions.GraftFunctions
          .qualityScore(col("extracted_text")) >= minQuality)
      // re-derived by the curate stage (and numBuckets may differ)
      .drop("part_bucket", "warc_day")
      .withColumn("id", xxhash64(col("url")))
    val curateLineage = run(spark, gated, s"$outDir/curated",
      idCol = "id", textCol = "extracted_text",
      numBuckets = numBuckets, snapshotGroups = snapshotGroups,
      runId = runId,
      canonicalCol = if (clusterByCanonical) Some("canonical_url") else None,
      reliable = reliable)
    (extractLineage, curateLineage)
  }

  /** Read the committed kept corpus. */
  def readKept(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/data")
}
