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

  test("resize stage: aspect-preserving cap, never upscales, 1px floor") {
    val pages = ExtractStage.generatePages(spark, 80, partitions = 4)
    val metaByUrl = Multimodal.decodeStage(pages).collect().map(m => m.url -> m).toMap
    val resized = Multimodal.resizeStage(pages, maxDim = 128).collect()
    assert(resized.length == 80)
    resized.foreach { r =>
      val m = metaByUrl(r.url)
      assert(r.orig_w == m.width && r.orig_h == m.height)
      assert(math.max(r.new_w, r.new_h) <= 128)
      assert((r.new_w >= 1 && r.new_h >= 1) || (r.orig_w == 0 && r.orig_h == 0))
      // no upscaling: dims <= originals; aspect preserved within rounding
      assert(r.new_w <= r.orig_w && r.new_h <= r.orig_h)
      if (math.max(r.orig_w, r.orig_h) > 128) {
        val want = r.orig_h.toDouble / r.orig_w
        val got = r.new_h.toDouble / r.new_w
        // rounding the short side to an int allows up to ~0.5/shortSide
        // relative drift
        assert(math.abs(want - got) / want < 0.1, s"aspect drift for ${r.url}")
      } else {
        assert(r.new_w == r.orig_w && r.new_h == r.orig_h) // small stays put
      }
    }
  }

  test("frame sampling: one row per sampled frame, capped, timing exact") {
    val pages = ExtractStage.generatePages(spark, 60, partitions = 4)
    val frames = Multimodal.frameSampleStage(pages, everyMs = 40000, maxFrames = 8).collect()
    val byUrl = frames.groupBy(_.url)
    byUrl.foreach { case (url, fs) =>
      assert(fs.length <= 8)
      val idxs = fs.map(_.frame_idx).sorted
      assert(idxs.sameElements(idxs.indices)) // dense 0..n-1
      fs.foreach(f => assert(f.frame_ts_ms == f.frame_idx * 40000L))
    }
    assert(frames.nonEmpty)
  }

  test("frame sampling rejects non-positive sampling intervals eagerly") {
    val pages = ExtractStage.generatePages(spark, 4, partitions = 1)
    // guard fires at plan-build time on the driver, not as an
    // ArithmeticException inside an executor task
    intercept[IllegalArgumentException] {
      Multimodal.frameSampleStage(pages, everyMs = 0)
    }
    intercept[IllegalArgumentException] {
      Multimodal.frameSampleStage(pages, everyMs = -5)
    }
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
