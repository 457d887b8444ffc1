package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-host template removal ([[TemplateStrip]]): the planted-corpus
  * semantics q97 oracles at corpus scale, pinned here at the row level —
  * including the cases the aggregate can't see (exact reassembled text,
  * ordering, the single-page-host guard, and the contrast with global
  * paragraph dedup).
  */
class TemplateStripSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import scala.jdk.CollectionConverters._
  private def docs(rows: (Long, String, String)*) = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("host", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)).asJava, schema)
  }

  // 8-word footer (one chunk) + per-doc unique 8-word content chunks
  private val footer = "nav home about contact press terms privacy logout"
  private def content(i: Long) =
    s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i"

  test("template chunk stripped from EVERY page of the host; content and order survive") {
    val d = docs(
      (1L, "a", s"$footer ${content(1)}"),
      (2L, "a", s"${content(2)} $footer"),   // footer mid/last position too
      (3L, "a", s"$footer ${content(3)}"),
      (4L, "a", s"$footer ${content(4)}"))
    val out = TemplateStrip.strip(d, "host", "doc_id", "text")
      .select("doc_id", "n_paras", "n_removed", "clean_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    // every doc had 2 chunks, lost exactly the footer, kept its content
    assert(out.map(_._2).toSeq == Seq(2L, 2L, 2L, 2L))
    assert(out.map(_._3).toSeq == Seq(1L, 1L, 1L, 1L))
    assert(out.map(_._4).toSeq == Seq(content(1), content(2), content(3), content(4)))
  }

  test("multi-chunk reassembly preserves paragraph order") {
    val d = docs(
      (1L, "a", s"${content(10)} $footer ${content(11)}"),
      (2L, "a", s"$footer ${content(20)}"))
    val out = TemplateStrip.strip(d, "host", "doc_id", "text")
      .filter(col("doc_id") === 1L).select("clean_text").head().getString(0)
    assert(out == s"${content(10)} ${content(11)}")
  }

  test("the majority boundary is STRICT: exactly 50% stays, above goes") {
    // footer on 2 of 4 docs = exactly 50% → KEPT (strict >); a second
    // banner on 3 of 4 docs = 75% → template. The strictness is what
    // keeps a two-page host's unique paragraphs (1 of 2 = 50%) alive.
    val banner = "subscribe to our newsletter for the weekly digest"
    val d = docs(
      (1L, "a", s"$footer $banner ${content(1)}"),
      (2L, "a", s"$footer $banner ${content(2)}"),
      (3L, "a", s"$banner ${content(3)}"),
      (4L, "a", content(4)))
    val out = TemplateStrip.strip(d, "host", "doc_id", "text")
      .select("doc_id", "n_removed").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
    // two-page host: every unique paragraph survives
    val two = docs((1L, "b", content(1)), (2L, "b", content(2)))
    val kept = TemplateStrip.strip(two, "host", "doc_id", "text")
      .agg(sum(col("n_removed"))).head().getLong(0)
    assert(kept == 0L)
  }

  test("single-page host is untouched (minHostDocs guard)") {
    val d = docs((1L, "solo", s"$footer ${content(1)}"))
    val out = TemplateStrip.strip(d, "host", "doc_id", "text").head()
    assert(out.getAs[Long]("n_removed") == 0L)
    assert(out.getAs[String]("clean_text") == s"$footer ${content(1)}")
  }

  test("hosts do not contaminate each other; all-template doc empties cleanly") {
    val d = docs(
      (1L, "a", s"$footer ${content(1)}"),
      (2L, "a", footer), // page that IS only boilerplate
      (3L, "b", s"$footer ${content(3)}")) // b is single-page: kept whole
    val out = TemplateStrip.strip(d, "host", "doc_id", "text")
      .select("doc_id", "clean_text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(1L) == content(1))
    assert(out(2L) == "")
    assert(out(3L) == s"$footer ${content(3)}")
  }
}
