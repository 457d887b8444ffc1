package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Epoch up-sampling ([[CorpusMixer.epochRates]]/[[CorpusMixer.upsample]]):
  * the q98 semantics pinned at the row level — copy-count arithmetic,
  * explode integrity, determinism, and the exclusion rule the down-sampling
  * path (q93) already oracles.
  */
class MixerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import scala.jdk.CollectionConverters._
  private def df(rows: Seq[org.apache.spark.sql.Row],
      fields: (String, org.apache.spark.sql.types.DataType)*) =
    spark.createDataFrame(rows.asJava, org.apache.spark.sql.types.StructType(
      fields.map(f => org.apache.spark.sql.types.StructField(f._1, f._2)).toSeq))

  import org.apache.spark.sql.types.{LongType, StringType}
  import org.apache.spark.sql.Row

  // two strata: 'small' 100 tokens total, 'big' 900 tokens total
  private lazy val docs = df(
    (0L until 20L).map(i => Row(i, if (i < 10) "small" else "big",
      if (i < 10) 10L else 90L)),
    ("doc_id", LongType), ("stratum", StringType), ("n_tokens", LongType))

  private lazy val weights = df(
    Seq(Row("small", 500000L), Row("big", 500000L)),
    ("stratum", StringType), ("weight_ppm", LongType))

  test("epoch rates are uncapped: oversubscribed stratum exceeds one epoch") {
    // budget = 2× corpus (2000 tokens), weights 50/50 → small wants 1000
    // tokens from a 100-token stratum = 10 epochs; big wants 1000 of 900
    val r = CorpusMixer.epochRates(docs, "stratum", weights,
        budgetSharePpm = 2000000L, tokensCol = "n_tokens")
      .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    assert(r("small") == 10000000L) // exactly 10 epochs
    assert(r("big") == 1111111L)    // 1000*1e6 div 900
  }

  test("exploded rows == sum of copy counts; copy indices are complete per doc") {
    val counts = CorpusMixer.copyCounts(docs, "stratum", weights, 2000000L)
    val up = CorpusMixer.upsample(docs, "stratum", weights, 2000000L)
    assert(up.count() == counts.agg(sum(col("n_copies"))).head().getLong(0))
    val perDoc = up.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), min(col("copy")).as("lo"), max(col("copy")).as("hi"),
        countDistinct(col("copy")).as("d"))
      .collect()
    perDoc.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L)
      assert(r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
      assert(r.getAs[Long]("d") == r.getAs[Long]("n"))
    }
    // every 'small' doc repeats exactly 10 times (rate has no fraction)
    val small = counts.filter(col("stratum") === "small")
      .select(col("n_copies")).collect().map(_.getLong(0))
    assert(small.length == 10 && small.forall(_ == 10L))
  }

  test("upsample is deterministic and a pure function of (id, rates)") {
    val a = CorpusMixer.upsample(docs, "stratum", weights, 2000000L)
      .select("doc_id", "copy").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = CorpusMixer.upsample(docs, "stratum", weights, 2000000L)
      .select("doc_id", "copy").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
  }

  test("a zero-token stratum samples to zero in BOTH paths (no div-by-zero NULL leak)") {
    val z = docs.unionByName(df(
      Seq(Row(100L, "empty", 0L), Row(101L, "empty", 0L)),
      ("doc_id", LongType), ("stratum", StringType), ("n_tokens", LongType)))
    val w = df(Seq(Row("small", 500000L), Row("big", 400000L), Row("empty", 100000L)),
      ("stratum", StringType), ("weight_ppm", LongType))
    val capped = CorpusMixer.sample(z, "stratum", w, budgetTokens = 500L)
    assert(capped.filter(col("stratum") === "empty").count() == 0L)
    assert(capped.filter(col("kept")).count() > 0L)
    val up = CorpusMixer.upsample(z, "stratum", w, budgetSharePpm = 2000000L)
    assert(up.filter(col("stratum") === "empty").count() == 0L)
    assert(up.count() > 0L)
  }

  test("unlisted strata are excluded (inner-join semantics)") {
    val w = df(Seq(Row("small", 1000000L)), ("stratum", StringType), ("weight_ppm", LongType))
    val up = CorpusMixer.upsample(docs, "stratum", w, 1000000L)
    assert(up.filter(col("stratum") === "big").count() == 0L)
    assert(up.filter(col("stratum") === "small").count() > 0L)
  }

  test("per-key cap: at most cap rows per key, order decides WHICH, under-cap keys keep all") {
    // 'big' has 10 docs (ids 10..19), 'small' has 10 (0..9); cap at 3
    // best-first by descending id — the kept sets are exact, not just sized
    val kept = CorpusMixer.capPerKey(docs, "stratum", 3,
        Seq(col("doc_id").desc))
      .select(col("stratum"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(kept.count(_._1 == "big") == 3)
    assert(kept.filter(_._1 == "big").map(_._2).sorted.toSeq == Seq(17L, 18L, 19L))
    assert(kept.filter(_._1 == "small").map(_._2).sorted.toSeq == Seq(7L, 8L, 9L))
    // a key with fewer rows than the cap keeps everything
    val tiny = df(Seq(Row(1L, "only"), Row(2L, "only")),
      ("doc_id", LongType), ("stratum", StringType))
    assert(CorpusMixer.capPerKey(tiny, "stratum", 5, Seq(col("doc_id"))).count() == 2L)
    // deterministic across runs (md5 order, unique tiebreak)
    def ids() = CorpusMixer.capPerKey(docs, "stratum", 4,
        Seq(md5(col("doc_id").cast("string")), col("doc_id")))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(ids() == ids())
  }
}
