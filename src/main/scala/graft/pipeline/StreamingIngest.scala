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

  /** Read the streaming-committed table (only manifest-committed batches —
    * a torn batch's files exist but aren't query-consistent yet).
    */
  def readCommitted(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame = {
    val committed = committedBatches(outDir).toSeq
    val df = spark.read.parquet(s"$outDir/data")
    if (committed.isEmpty) df.filter(lit(false))
    else df.filter(col("ingest_batch").isin(committed.map(java.lang.Long.valueOf): _*))
  }
}
