package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("magic sniffing types payloads correctly") {
    assert(Multimodal.sniff("%PDF-1.4".getBytes) == "pdf")
    assert(Multimodal.sniff(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)) == "image")
    assert(Multimodal.sniff(Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)) == "image")
    assert(Multimodal.sniff("RIFF....WAVE".getBytes) == "audio")
    assert(Multimodal.sniff("ID3".getBytes) == "audio")
    assert(Multimodal.sniff("<html>".getBytes) == "html")
    assert(Multimodal.sniff(null) == "unknown")
  }

  test("decode stage emits one typed row per payload with stable features") {
    import spark.implicits._
    val pages = ExtractStage.generatePages(spark, 100, partitions = 4)
    val meta = Multimodal.decodeStage(pages)
    val rows = meta.collect()
    assert(rows.length == 100)
    assert(rows.forall(_.features.length == 8))
    val kinds = rows.groupBy(_.media_type).view.mapValues(_.length).toMap
    assert(kinds.contains("pdf") && kinds.contains("html"))
    // determinism: second pass identical
    val again = Multimodal.decodeStage(pages).collect()
    assert(rows.sortBy(_.url).zip(again.sortBy(_.url)).forall {
      case (a, b) => a.features.sameElements(b.features) && a.width == b.width
    })
  }

  test("feature KNN returns top-k per query within media type") {
    val pages = ExtractStage.generatePages(spark, 60, partitions = 4)
    val meta = Multimodal.decodeStage(pages).toDF()
    val knn = Multimodal.featureKnn(meta, k = 2).collect()
    assert(knn.nonEmpty)
    val byQuery = knn.groupBy(r => r.getString(1))
    byQuery.values.foreach { rs =>
      assert(rs.length <= 2)
      assert(rs.map(_.getInt(2)).sorted.sameElements(1 to rs.length)) // rnk 1..k
    }
  }
}
