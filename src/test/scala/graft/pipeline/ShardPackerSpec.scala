package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType}

/** Context-window packing ([[ShardPacker.packContext]]): hand-computed
  * boundary cases for the concat-and-chunk layout — straddling docs,
  * zero-token docs, an exactly-full bucket, and input-order independence
  * (packing is a pure function of (bucket, order, tokens)).
  */
class ShardPackerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import scala.jdk.CollectionConverters._

  private def docs(rows: (String, Long, Long)*) =
    spark.createDataFrame(
      rows.map { case (b, id, n) => Row(b, id, n) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bucket", StringType),
        org.apache.spark.sql.types.StructField("doc_id", LongType),
        org.apache.spark.sql.types.StructField("n_tokens", LongType))))

  private def spans(d: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
    ShardPacker.packContext(d, "bucket", "doc_id", "n_tokens", 512L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("seq_first"), r.getAs[Long]("seq_last")))).toMap

  test("straddling docs, zero-token docs, tail: hand-computed sequence spans") {
    // bucket A token stream: 300 | 300 | 500 | 0 | 24 (cum 300 600 1100 1100 1124)
    val out = spans(docs(
      ("A", 1L, 300L), ("A", 2L, 300L), ("A", 3L, 500L), ("A", 4L, 0L), ("A", 5L, 24L),
      ("B", 10L, 512L)))                       // exactly one full sequence
    assert(out(1L) == ((0L, 0L)))              // tokens 0..299
    assert(out(2L) == ((0L, 1L)))              // 300..599 — crosses the cut at 512
    assert(out(3L) == ((1L, 2L)))              // 600..1099 — crosses the cut at 1024
    assert(out(4L) == ((2L, 2L)))              // zero tokens: pinned, never "crossing"
    assert(out(5L) == ((2L, 2L)))              // 1100..1123
    assert(out(10L) == ((0L, 0L)))             // 0..511 — exactly full, no spill
  }

  test("packing is independent of input row order") {
    val rows = Seq(("A", 1L, 300L), ("A", 2L, 300L), ("A", 3L, 500L),
      ("A", 4L, 0L), ("A", 5L, 24L), ("B", 10L, 512L))
    assert(spans(docs(rows: _*)) == spans(docs(rows.reverse: _*)))
  }
}
