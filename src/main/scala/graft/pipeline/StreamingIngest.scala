package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Continuous ingestion into the committed extract table: a Structured
  * Streaming source of pages → the extract stage → `foreachBatch` commits
  * each micro-batch into the same `(part_bucket, warc_day)` layout the
  * batch pipeline writes, EXACTLY ONCE across failures and replays.
  *
  * Exactly-once recipe (the standard transactional-foreachBatch pattern,
  * specialized to this table):
  *   - every row of micro-batch B lands under an `ingest_batch=B`
  *     partition prefix, so a batch's output is a disjoint set of
  *     partition directories;
  *   - the write uses DYNAMIC partition overwrite — a REPLAYED batch
  *     (stream restart from the sink checkpoint) rewrites exactly its own
  *     `ingest_batch=B/...` partitions with identical deterministic rows,
  *     never duplicating and never touching other batches;
  *   - the manifest line for B is appended AFTER the parquet write; a
  *     kill between the two leaves a torn batch whose replay converges,
  *     and `committedBatches` tells downstream readers which batches are
  *     query-consistent.
  *
  * Bucket/day pruning still applies under the batch prefix: partition
  * pruning composes across levels, so a point read scans
  * (#batches × 1 bucket) directories, and compaction (collapsing old
  * batch prefixes into the plain layout via the batch pipeline) is the
  * standard follow-up at scale.
  */
object StreamingIngest {

  def committedBatches(outDir: String): Set[Long] = {
    val mf = Paths.get(outDir, "_manifest", "stream_manifest.jsonl")
    if (!Files.exists(mf)) Set.empty
    else Files.readAllLines(mf).asScala.flatMap { line =>
      val m = java.util.regex.Pattern.compile("\"batch_id\":(\\d+)").matcher(line)
      if (m.find()) Some(m.group(1).toLong) else None
    }.toSet
  }

  private def appendManifest(outDir: String, batchId: Long, rows: Long, ok: Long): Unit = {
    val dir = Paths.get(outDir, "_manifest")
    Files.createDirectories(dir)
    val line = s"""{"batch_id":$batchId,"rows":$rows,"ok_rows":$ok}""" + "\n"
    Files.write(dir.resolve("stream_manifest.jsonl"), line.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** The `foreachBatch` function: extract + commit one micro-batch.
    * Public and directly callable so tests (and a replay after restart)
    * can exercise idempotence without a running stream.
    */
  def commitBatch(outDir: String, numBuckets: Int = 32)(
      batch: Dataset[Page], batchId: Long): Unit = {
    if (committedBatches(outDir).contains(batchId)) return // replayed + committed → no-op
    val spark = batch.sparkSession
    import spark.implicits._
    val extracted = batch.mapPartitions(_.map(ExtractStage.processOne)).toDF()
      .withColumn("ingest_batch", lit(batchId))
      .withColumn("part_bucket", pmod(xxhash64(col("url")), lit(numBuckets)).cast("int"))
      .withColumn("warc_day", to_date(col("warc_ts")))
    extracted.write.mode(SaveMode.Overwrite)
      .partitionBy("ingest_batch", "part_bucket", "warc_day")
      // dynamic overwrite scoped to THIS batch's partitions: replay rewrites
      // ingest_batch=<id>/... in place, exactly-once by construction
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "zstd")
      .option("parquet.block.size", (16 * 1024 * 1024).toString)
      .parquet(s"$outDir/data")
    val stats = spark.read.parquet(s"$outDir/data")
      .filter(col("ingest_batch") === batchId)
      .agg(count(lit(1)), sum(when(col("success"), 1L).otherwise(0L))).head()
    appendManifest(outDir, batchId, stats.getLong(0),
      if (stats.isNullAt(1)) 0L else stats.getLong(1))
  }

  /** Wire a pages stream into the committed table. Caller starts/stops the
    * returned query (tests use `processAllAvailable`).
    */
  def start(pages: Dataset[Page], outDir: String, checkpointDir: String,
      numBuckets: Int = 32): org.apache.spark.sql.streaming.StreamingQuery =
    pages.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Page], batchId: Long) =>
        commitBatch(outDir, numBuckets)(batch, batchId)
      }
      .start()

  /** The table schema before any batch lands: the extract row plus the
    * three partition columns. Lets a freshly-initialized table answer
    * reads with an EMPTY DataFrame instead of AnalysisException-ing on a
    * data directory that doesn't exist yet.
    */
  private def emptyTable(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[ExtractedPage].toDF()
      .withColumn("ingest_batch", lit(0L))
      .withColumn("part_bucket", lit(0))
      .withColumn("warc_day", to_date(col("warc_ts")))
  }

  /** The full continuous pipeline: each micro-batch extract-commits
    * exactly once into the streaming extract table, THEN folds into the
    * curated kept corpus — the first batch builds the corpus + band-key
    * index, every later batch curates incrementally against the stored
    * index ([[CuratedPipeline.curateBatch]]). This is the deployment
    * shape the north star implies: a crawl feed runs continuously and
    * curation cost per batch is O(batch + collisions), never O(corpus).
    * Both stages are idempotent under stream replay, so exactly-once
    * holds end to end from WARC segment to kept corpus.
    */
  def startCurated(pages: Dataset[Page], extractDir: String, curatedDir: String,
      checkpointDir: String, numBuckets: Int = 32):
      org.apache.spark.sql.streaming.StreamingQuery =
    pages.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Page], batchId: Long) =>
        commitBatch(extractDir, numBuckets)(batch, batchId)
        CuratedPipeline.curateBatch(batch.sparkSession, batchId,
          extractDir, curatedDir, numBuckets)
        ()
      }
      .start()

  /** Read the streaming-committed table (only manifest-committed batches —
    * a torn batch's files exist but aren't query-consistent yet).
    */
  def readCommitted(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame = {
    val committed = committedBatches(outDir).toSeq
    if (committed.isEmpty || !Files.exists(Paths.get(outDir, "data")))
      return emptyTable(spark)
    spark.read.parquet(s"$outDir/data")
      .filter(col("ingest_batch").isin(committed.map(java.lang.Long.valueOf): _*))
      // partition-dir inference narrows ingest_batch to int; pin it to
      // long so every read path (raw, compact — where it is a DATA column
      // and therefore long — and the empty table) exposes ONE schema
      .withColumn("ingest_batch", col("ingest_batch").cast("long"))
  }

  // ---- compaction ---------------------------------------------------------
  //
  // Continuous ingestion accretes an ingest_batch=B prefix per micro-batch:
  // after a day of 1-minute batches a point read prunes to one bucket but
  // still opens 1440 batch directories of small files. Compaction folds
  // committed batches into a VERSIONED plain (part_bucket, warc_day) layout:
  //   compact/v<N>/part_bucket=<b>/warc_day=<d>/…  (≈1 file per partition)
  // and commits the fold by appending {version, batches} to
  // compact_manifest.jsonl AFTER the write — the Iceberg snapshot pattern
  // again. Readers (`readAll`) see compact v<current> ∪ committed batches
  // not yet folded, so every row is visible exactly once at every point;
  // a compaction killed before its manifest line is invisible and a replay
  // rewrites the same deterministic version directory. Single maintenance
  // writer assumed (as with Iceberg's rewrite_data_files).

  private final case class CompactState(version: Long, folded: Set[Long])

  private def compactState(outDir: String): CompactState = {
    val mf = Paths.get(outDir, "_manifest", "compact_manifest.jsonl")
    if (!Files.exists(mf)) return CompactState(0L, Set.empty)
    val lines = Files.readAllLines(mf).asScala
    if (lines.isEmpty) return CompactState(0L, Set.empty)
    var version = 0L
    val folded = scala.collection.mutable.Set.empty[Long]
    lines.foreach { line =>
      val vm = java.util.regex.Pattern.compile("\"version\":(\\d+)").matcher(line)
      if (vm.find()) version = math.max(version, vm.group(1).toLong)
      val bm = java.util.regex.Pattern.compile("\"batches\":\\[([0-9,]*)\\]").matcher(line)
      if (bm.find() && bm.group(1).nonEmpty)
        folded ++= bm.group(1).split(",").map(_.toLong)
    }
    CompactState(version, folded.toSet)
  }

  /** Fold all committed-but-unfolded batches into the next compact version.
    * Returns the new version, or the current one if nothing to fold.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, outDir: String,
      numBuckets: Int = 32): Long = {
    val st = compactState(outDir)
    val todo = (committedBatches(outDir) -- st.folded).toSeq.sorted
    if (todo.isEmpty) return st.version
    val newRows = spark.read.parquet(s"$outDir/data")
      .filter(col("ingest_batch").isin(todo.map(java.lang.Long.valueOf): _*))
      // ingest_batch becomes a DATA column in the compact layout: pin it
      // to long before writing so compact files always agree with the
      // normalized read schema
      .withColumn("ingest_batch", col("ingest_batch").cast("long"))
    val prev =
      if (st.version == 0L) None
      else Some(spark.read.parquet(s"$outDir/compact/v${st.version}"))
    // (ingest_batch, url) is the row identity → the fold is idempotent even
    // if a crashed run half-wrote this version before the replay
    val union = prev.map(_.unionByName(newRows)).getOrElse(newRows)
      .dropDuplicates("ingest_batch", "url")
      .repartition(numBuckets, col("part_bucket")) // ≈1 file per bucket dir
    val next = st.version + 1
    union.write.mode(SaveMode.Overwrite)
      .partitionBy("part_bucket", "warc_day")
      .option("compression", "zstd")
      .option("parquet.block.size", (16 * 1024 * 1024).toString)
      .parquet(s"$outDir/compact/v$next")
    val dir = Paths.get(outDir, "_manifest")
    Files.createDirectories(dir)
    val line = s"""{"version":$next,"batches":[${(st.folded ++ todo).toSeq.sorted.mkString(",")}]}""" + "\n"
    Files.write(dir.resolve("compact_manifest.jsonl"), line.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    next
  }

  /** Unified read: current compact version ∪ committed-but-unfolded batches.
    * Every committed row is visible exactly once regardless of how much has
    * been compacted.
    */
  def readAll(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame = {
    val st = compactState(outDir)
    val live = (committedBatches(outDir) -- st.folded).toSeq
    if (st.version == 0L) readCommitted(spark, outDir)
    else {
      val compactDf = spark.read.parquet(s"$outDir/compact/v${st.version}")
        .withColumn("ingest_batch", col("ingest_batch").cast("long"))
      if (live.isEmpty) compactDf // raw dirs may already be vacuumed
      else {
        val liveDf = spark.read.parquet(s"$outDir/data")
          .filter(col("ingest_batch").isin(live.map(java.lang.Long.valueOf): _*))
          .withColumn("ingest_batch", col("ingest_batch").cast("long"))
        compactDf.unionByName(liveDf.select(compactDf.columns.map(col): _*))
      }
    }
  }

  /** Delete raw batch directories already folded and compact versions older
    * than current. Run only when no reader is mid-query (single-writer
    * maintenance, same caveat as Iceberg's expire_snapshots).
    */
  def vacuum(outDir: String): Unit = {
    val st = compactState(outDir)
    def rmTree(p: java.nio.file.Path): Unit =
      if (Files.exists(p)) {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => Files.delete(f))
      }
    st.folded.foreach { b =>
      rmTree(Paths.get(outDir, "data", s"ingest_batch=$b"))
    }
    val compactRoot = Paths.get(outDir, "compact")
    if (Files.exists(compactRoot)) {
      Files.list(compactRoot).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("v") &&
          p.getFileName.toString.drop(1).toLongOption.exists(_ < st.version))
        .foreach(rmTree)
    }
  }
}
