package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

// top-level for Spark encoder derivation (local case classes lack TypeTags)
final case class CurDoc(id: Long, url: String, warc_ts: java.sql.Timestamp,
    text: String, src: String)

class CuratedPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("curated-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(): String =
    Files.createTempDirectory("graft-curated-spec").toString

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** Known duplicate structure: two exact-dup clusters, two unique long
    * docs, two short (<3 words, unshingleable) docs.
    */
  private def corpus() = {
    import spark.implicits._
    Seq(
      CurDoc(10L, "u10", ts("2024-03-01 10:00:00"), "the quick brown fox jumps over the lazy dog", "a"),
      CurDoc(11L, "u11", ts("2024-03-01 11:00:00"), "the quick brown fox jumps over the lazy dog", "a"),
      CurDoc(12L, "u12", ts("2024-03-02 09:00:00"), "the quick brown fox jumps over the lazy dog", "b"),
      CurDoc(20L, "u20", ts("2024-03-01 10:00:00"), "pack my box with five dozen liquor jugs today", "a"),
      CurDoc(21L, "u21", ts("2024-03-03 10:00:00"), "pack my box with five dozen liquor jugs today", "b"),
      CurDoc(30L, "u30", ts("2024-03-01 10:00:00"), "sphinx of black quartz judge my vow quickly now", "a"),
      CurDoc(31L, "u31", ts("2024-03-02 10:00:00"), "how vexingly quick daft zebras jump around here", "b"),
      CurDoc(40L, "u40", ts("2024-03-01 10:00:00"), "hi", "a"),
      CurDoc(41L, "u41", ts("2024-03-02 10:00:00"), "ok then", "b")
    ).toDF()
  }

  test("curate keeps the min-id canonical per cluster plus short singletons") {
    import spark.implicits._
    val out = tmpDir()
    val lineage = CuratedPipeline.run(spark, corpus(), out,
      numBuckets = 8, snapshotGroups = 2, runId = "keep")
    val kept = CuratedPipeline.readKept(spark, out)
    val ids = kept.select($"id").as[Long].collect().sorted
    assert(ids.sameElements(Array(10L, 20L, 30L, 31L, 40L, 41L)),
      s"kept set wrong: ${ids.mkString(",")}")
    // lineage accounts for exactly the kept rows
    assert(lineage.map(_.input_rows).sum == 6)
    assert(lineage.forall(l => l.fail_rows == 0 && l.status == "committed"))
    // passthrough columns and layout survive
    assert(kept.columns.toSet ==
      Set("id", "url", "warc_ts", "text", "src", "curate_inc", "part_bucket", "warc_day"))
    // base build lands wholesale under the increment-0 prefix; appends from
    // later increments get their own prefix and never rewrite it
    val incDirs = new java.io.File(s"$out/data").listFiles().filter(_.isDirectory)
    assert(incDirs.map(_.getName).toSeq == Seq("curate_inc=0"))
    assert(incDirs.head.listFiles().filter(_.isDirectory)
      .forall(_.getName.startsWith("part_bucket=")))

    // kept corpus is dedup-closed: re-clustering it finds only singletons
    // (two canonicals can never band-collide — a collision would have made
    // them one component in the original clustering)
    val relab = Dedup.minhashClusterLabels(kept, "id", "text")
      .as[(Long, Long)].collect()
    assert(relab.forall { case (id, comp) => id == comp },
      s"kept corpus must have no duplicate clusters, got ${relab.mkString(",")}")
  }

  test("canonical-aware curate keeps one doc per site-declared group") {
    import spark.implicits._
    val out = tmpDir()
    val docs = Seq(
      (10L, "u10", ts("2024-03-01 10:00:00"), "the quick brown fox jumps over the lazy dog", "https://e.com/x"),
      (11L, "u11", ts("2024-03-01 11:00:00"), "pack my box with five dozen liquor jugs today", "https://e.com/x"),
      (20L, "u20", ts("2024-03-02 10:00:00"), "sphinx of black quartz judge my vow quickly now", null),
      (30L, "u30", ts("2024-03-03 10:00:00"), "hi", "https://e.com/x"),
      (40L, "u40", ts("2024-03-04 10:00:00"), "ok", null)
    ).toDF("id", "url", "warc_ts", "text", "canonical")
    CuratedPipeline.run(spark, docs, out, numBuckets = 8, snapshotGroups = 2,
      runId = "canon", canonicalCol = Some("canonical"))
    val ids = CuratedPipeline.readKept(spark, out).select($"id").as[Long].collect().sorted
    // 10/11/30 share a canonical (different texts, one short) → keep 10;
    // 20 content-unique; 40 short and keyless → trivially kept
    assert(ids.sameElements(Array(10L, 20L, 40L)), s"got ${ids.mkString(",")}")
  }

  test("robots noindex pages never reach the kept corpus (and the gate is optional)") {
    import spark.implicits._
    val n = 600L
    val pages = ExtractStage.generatePages(spark, n, partitions = 8)
    // the generator emits ~1/20 noindex pages — make sure this corpus has some
    val extractProbe = ExtractStage.run(pages).filter($"noindex").count()
    assert(extractProbe > 0, "generator corpus must contain noindex pages for this test")

    val out = tmpDir()
    CuratedPipeline.runFromPages(spark, pages, out,
      numBuckets = 8, snapshotGroups = 2, runId = "robots")
    val kept = CuratedPipeline.readKept(spark, s"$out/curated")
    assert(kept.filter($"noindex").count() == 0,
      "honorNoindex=true must drop every noindex page before dedup")

    val outOff = tmpDir()
    CuratedPipeline.runFromPages(spark, pages, outOff,
      numBuckets = 8, snapshotGroups = 2, runId = "robots-off",
      honorNoindex = false)
    assert(CuratedPipeline.readKept(spark, s"$outOff/curated")
      .filter($"noindex").count() > 0,
      "honorNoindex=false must keep (non-duplicate) noindex pages")
  }

  test("templateStrip removes per-host boilerplate before dedup; all-template pages leave the corpus") {
    import spark.implicits._
    val footer = "nav home about contact press terms privacy logout"
    def content(i: Int) = s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i"
    // S4 fallback pages (empty html → the text column is the extraction),
    // two hosts, every page carrying the host footer, plus one page that
    // IS only the footer
    val rows = (1 to 8).map { i =>
      val host = if (i <= 4) "a.example" else "b.example"
      Page(s"https://$host/p$i", ts("2024-03-01 10:00:00"),
        Array.empty[Byte], s"$footer ${content(i)}", "en")
    } :+ Page("https://a.example/only-footer", ts("2024-03-01 10:00:00"),
      Array.empty[Byte], footer, "en")
    val pages = spark.createDataset(rows)

    val out = tmpDir()
    CuratedPipeline.runFromPages(spark, pages, out,
      numBuckets = 4, snapshotGroups = 1, runId = "tmpl", templateStrip = true)
    val kept = CuratedPipeline.readKept(spark, s"$out/curated")
      .select($"url", $"extracted_text").as[(String, String)].collect().toMap
    // the all-template page left the corpus; every kept text is pure content
    assert(kept.size == 8, s"expected 8 kept docs, got ${kept.keySet}")
    (1 to 8).foreach { i =>
      val host = if (i <= 4) "a.example" else "b.example"
      assert(kept(s"https://$host/p$i") == content(i))
    }
    // without the flag the footer survives (and the footer-only page stays)
    val outOff = tmpDir()
    CuratedPipeline.runFromPages(spark, pages, outOff,
      numBuckets = 4, snapshotGroups = 1, runId = "tmpl-off")
    val keptOff = CuratedPipeline.readKept(spark, s"$outOff/curated")
      .select($"extracted_text").as[String].collect()
    // (kept COUNT is not asserted here: with the footer in place the docs
    // share ~half their shingles and LSH may legitimately band some)
    assert(keptOff.nonEmpty && keptOff.forall(_.contains(footer)))
  }

  test("hostCap balances domains in the composed pipeline: per-host kept counts bounded, under-cap hosts untouched") {
    import spark.implicits._
    def content(h: String, i: Int) =
      s"${h}w$i ${h}unique$i ${h}words$i ${h}here$i ${h}now$i ${h}extra$i ${h}tail$i ${h}end$i"
    // three hosts with 6 / 4 / 2 pages of fully distinct content
    val rows = (for ((h, n) <- Seq(("a", 6), ("b", 4), ("c", 2)); i <- 1 to n)
      yield Page(s"https://$h.example/p$i", ts("2024-03-01 10:00:00"),
        Array.empty[Byte], content(h, i), "en")).toVector
    val pages = spark.createDataset(rows)

    val out = tmpDir()
    CuratedPipeline.runFromPages(spark, pages, out,
      numBuckets = 4, snapshotGroups = 1, runId = "hostcap", hostCap = Some(3))
    val byHost = CuratedPipeline.readKept(spark, s"$out/curated")
      .withColumn("h", SkewTools.hostOf($"url"))
      .groupBy($"h").count().as[(String, Long)].collect().toMap
    assert(byHost == Map("a.example" -> 3L, "b.example" -> 3L, "c.example" -> 2L),
      s"cap 3 must bound a/b and leave c whole, got $byHost")

    // determinism: the same input caps to the SAME kept id set
    val out2 = tmpDir()
    CuratedPipeline.runFromPages(spark, pages, out2,
      numBuckets = 4, snapshotGroups = 1, runId = "hostcap2", hostCap = Some(3))
    def ids(o: String) = CuratedPipeline.readKept(spark, s"$o/curated")
      .select($"id").as[Long].collect().sorted.toSeq
    assert(ids(out) == ids(out2))

    // without the cap every distinct page survives
    val outOff = tmpDir()
    CuratedPipeline.runFromPages(spark, pages, outOff,
      numBuckets = 4, snapshotGroups = 1, runId = "hostcap-off")
    assert(CuratedPipeline.readKept(spark, s"$outOff/curated").count() == 12L)
  }

  test("blocklist gates hosts in the composed pipeline: blocked subtree out, allow exception kept, unlisted untouched") {
    import spark.implicits._
    def content(h: String, i: Int) =
      s"${h}w$i ${h}unique$i ${h}words$i ${h}here$i ${h}now$i ${h}extra$i ${h}tail$i ${h}end$i"
    val rows = (for ((h, n) <- Seq(("bad.example", 3), ("sub.bad.example", 2),
        ("ok.bad.example", 2), ("good.example", 3)); i <- 1 to n)
      yield Page(s"https://$h/p$i", ts("2024-03-01 10:00:00"),
        Array.empty[Byte], content(h.replace(".", ""), i), "en")).toVector
    val pages = spark.createDataset(rows)
    val rules = spark.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row("bad.example", "ads"),
        org.apache.spark.sql.Row("ok.bad.example", "allow")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pattern",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("category",
          org.apache.spark.sql.types.StringType))))

    val out = tmpDir()
    CuratedPipeline.runFromPages(spark, pages, out,
      numBuckets = 4, snapshotGroups = 1, runId = "blk", blocklist = Some(rules))
    val byHost = CuratedPipeline.readKept(spark, s"$out/curated")
      .withColumn("h", SkewTools.hostOf($"url"))
      .groupBy($"h").count().as[(String, Long)].collect().toMap
    // bad.example and sub.bad.example are gone (rule covers the subtree);
    // ok.bad.example survives via the allow exception; good.example whole
    assert(byHost == Map("ok.bad.example" -> 2L, "good.example" -> 3L),
      s"blocklist must drop the blocked subtree only, got $byHost")

    // without the blocklist every distinct page survives
    val outOff = tmpDir()
    CuratedPipeline.runFromPages(spark, pages, outOff,
      numBuckets = 4, snapshotGroups = 1, runId = "blk-off")
    assert(CuratedPipeline.readKept(spark, s"$outOff/curated").count() == 10L)
  }

  test("site-declared canonical groups collapse to one kept doc in the composed pipeline") {
    import spark.implicits._
    val n = 600L
    val pages = ExtractStage.generatePages(spark, n, partitions = 8)
    val out = tmpDir()
    CuratedPipeline.runFromPages(spark, pages, out,
      numBuckets = 8, snapshotGroups = 2, runId = "canon-e2e")
    val extracted = ExtractPipeline.readOutput(spark, s"$out/extract")
    // the generator corpus must actually contain a multi-member canonical
    // group that survives the gates, or this test proves nothing
    val groups = extracted
      .filter($"success" && !$"noindex" && trim($"canonical_url") =!= "")
      .groupBy($"canonical_url").count().filter($"count" > 1).count()
    assert(groups > 0, "corpus must contain a shared canonical group")
    val dupKept = CuratedPipeline.readKept(spark, s"$out/curated")
      .filter(trim($"canonical_url") =!= "")
      .groupBy($"canonical_url").count().filter($"count" > 1).count()
    assert(dupKept == 0,
      "no two kept docs may declare the same canonical target")
  }

  // ---- incremental curation: increment ≡ full recompute -------------------

  private def keptState(out: String) = {
    import spark.implicits._
    CuratedPipeline.readKept(spark, out)
      .select($"id", $"text").as[(Long, String)].collect().sortBy(_._1).toSeq
  }
  private def labelState(out: String) = {
    import spark.implicits._
    CuratedPipeline.readLabels(spark, out)
      .as[(Long, Long)].collect().sorted.toSeq
  }

  test("curateIncrement(b2) after run(b1) equals run(b1 ∪ b2): appends, drops, logical demotion") {
    import spark.implicits._
    val textA = "the quick brown fox jumps over the lazy dog"
    val textB = "pack my box with five dozen liquor jugs today"
    val textC = "sphinx of black quartz judge my vow quickly now"
    val textD = "how vexingly quick daft zebras jump around here"
    val textE = "bright vixens jump while dozy fowl quack loudly"
    val b1 = Seq(
      CurDoc(10L, "u10", ts("2024-03-01 10:00:00"), textA, "a"),
      CurDoc(11L, "u11", ts("2024-03-01 11:00:00"), textA, "a"), // dup of 10
      CurDoc(20L, "u20", ts("2024-03-02 09:00:00"), textB, "a"),
      CurDoc(30L, "u30", ts("2024-03-01 10:00:00"), textC, "a"),
      // unique warc_day: its (bucket, day) partition must VANISH on demotion
      CurDoc(40L, "u40", ts("2024-07-19 10:00:00"), textD, "a"),
      CurDoc(41L, "u41", ts("2024-03-02 10:00:00"), "hi", "a")).toDF()
    val b2 = Seq(
      CurDoc(5L, "u05", ts("2024-03-05 10:00:00"), textD, "b"),  // smaller id → demotes 40
      CurDoc(50L, "u50", ts("2024-03-05 11:00:00"), textB, "b"), // larger-id dup → dropped
      CurDoc(60L, "u60", ts("2024-03-05 12:00:00"), textE, "b"), // new unique → kept
      CurDoc(61L, "u61", ts("2024-03-05 13:00:00"), "yo", "b")).toDF() // short → kept

    val outA = tmpDir(); val outB = tmpDir()
    CuratedPipeline.run(spark, b1, outA, numBuckets = 8, snapshotGroups = 2, runId = "b1")
    assert(keptState(outA).map(_._1) == Seq(10L, 20L, 30L, 40L, 41L))
    val lineage = CuratedPipeline.curateIncrement(spark, b2, outA,
      numBuckets = 8, runId = "b2")
    assert(lineage.nonEmpty)
    CuratedPipeline.run(spark, b1.unionByName(b2), outB,
      numBuckets = 8, snapshotGroups = 2, runId = "full")

    assert(keptState(outA) == keptState(outB),
      "incrementally curated kept corpus must equal the full recompute")
    assert(keptState(outA).map(_._1) == Seq(5L, 10L, 20L, 30L, 41L, 60L, 61L))
    // the increment's appends landed under their OWN prefix — the O(batch)
    // property: no append ever rewrites an existing increment's partitions
    assert(new java.io.File(s"$outA/data").listFiles().filter(_.isDirectory)
      .map(_.getName).toSet == Set("curate_inc=0", "curate_inc=1"))
    assert(labelState(outA) == labelState(outB),
      "incrementally maintained labels must equal the full recompute")
    // demotion is LOGICAL (merge-on-read): doc 40's partition is still on
    // disk — the increment never rewrites existing data — and the delete
    // table carries exactly the demoted id
    val days = new java.io.File(s"$outA/data").listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.isDirectory)
      .flatMap(_.listFiles()).map(_.getName).toSet
    assert(days.contains("warc_day=2024-07-19"),
      s"demotion must not rewrite data partitions, saw $days")
    assert(CuratedPipeline.readDemoted(spark, outA)
      .as[(Long, Long)].collect().toSeq == Seq((40L, 1L)))
  }

  test("an EMPTY increment is a no-op: no snapshot, no prefix, compactKept survives a legacy empty prefix") {
    import spark.implicits._
    val out = tmpDir()
    CuratedPipeline.run(spark, corpus(), out, numBuckets = 8, snapshotGroups = 2, runId = "e0")
    val kept0 = keptState(out)
    val snaps0 = CuratedPipeline.keptSnapshots(out)
    // a resumed job whose delta anti-joined to nothing curates an empty frame
    val lineage = CuratedPipeline.curateIncrement(spark,
      corpus().filter($"id" < 0), out, textCol = "text", numBuckets = 8, runId = "e1")
    assert(lineage.isEmpty)
    assert(CuratedPipeline.keptSnapshots(out) == snaps0, "no snapshot for an empty increment")
    assert(keptState(out) == kept0)
    // a legacy/torn rows-less prefix must not poison the fold's schema read
    val emptyPrefix = new java.io.File(s"$out/data/curate_inc=7")
    assert(emptyPrefix.mkdirs())
    val v = CuratedPipeline.compactKept(spark, out, numBuckets = 8)
    assert(v == 1L)
    assert(keptState(out) == kept0, "fold across the empty prefix must not change the view")
  }

  test("curateIncrement merges two existing components through a bridge doc (canonical + content)") {
    import spark.implicits._
    val textA = "the quick brown fox jumps over the lazy dog"
    val textF = "grumpy wizards make toxic brew for the evil queen"
    val b1 = Seq(
      (10L, "u10", ts("2024-03-01 10:00:00"), textA, null.asInstanceOf[String]),
      (11L, "u11", ts("2024-03-01 11:00:00"), textA, null.asInstanceOf[String]),
      (15L, "u15", ts("2024-03-02 10:00:00"), textF, "https://e.com/c")
    ).toDF("id", "url", "warc_ts", "text", "canonical")
    // 70 shares CONTENT with {10,11} and CANONICAL with {15}: all four
    // must become one component labeled 10, demoting 15
    val b2 = Seq(
      (70L, "u70", ts("2024-03-05 10:00:00"), textA, "https://e.com/c")
    ).toDF("id", "url", "warc_ts", "text", "canonical")

    val outA = tmpDir(); val outB = tmpDir()
    CuratedPipeline.run(spark, b1, outA, numBuckets = 8, snapshotGroups = 2,
      runId = "b1", canonicalCol = Some("canonical"))
    assert(keptState(outA).map(_._1) == Seq(10L, 15L))
    CuratedPipeline.curateIncrement(spark, b2, outA, numBuckets = 8,
      runId = "b2", canonicalCol = Some("canonical"))
    CuratedPipeline.run(spark, b1.unionByName(b2), outB, numBuckets = 8,
      snapshotGroups = 2, runId = "full", canonicalCol = Some("canonical"))

    assert(keptState(outA) == keptState(outB))
    assert(keptState(outA).map(_._1) == Seq(10L))
    assert(labelState(outA) == labelState(outB))
    assert(labelState(outA).forall(_._2 == 10L),
      s"bridge must merge everything into comp 10, got ${labelState(outA)}")
  }

  test("a torn increment (killed before the index commit) replays to the identical state") {
    import spark.implicits._
    val textA = "the quick brown fox jumps over the lazy dog"
    val textD = "how vexingly quick daft zebras jump around here"
    val b1 = Seq(
      CurDoc(10L, "u10", ts("2024-03-01 10:00:00"), textA, "a"),
      CurDoc(40L, "u40", ts("2024-03-02 10:00:00"), textD, "a")).toDF()
    val b2 = Seq(
      CurDoc(5L, "u05", ts("2024-03-05 10:00:00"), textD, "b"),
      CurDoc(60L, "u60", ts("2024-03-05 12:00:00"),
        "bright vixens jump while dozy fowl quack loudly", "b")).toDF()

    val outA = tmpDir(); val outB = tmpDir()
    CuratedPipeline.run(spark, b1, outA, numBuckets = 4, snapshotGroups = 1, runId = "b1")
    CuratedPipeline.curateIncrement(spark, b2, outA, numBuckets = 4, runId = "b2")

    // simulate the crash: the kept rewrite and index parquet landed, but the
    // index manifest line (the commit point) did not → roll the manifest back
    val mf = Paths.get(outA, "_manifest", "index_manifest.jsonl")
    val lines = Files.readAllLines(mf)
    Files.write(mf, (lines.get(0) + "\n").getBytes("UTF-8"))
    assert(CuratedPipeline.indexState(outA)._1 == 1L)

    // replay the increment from the previous committed index
    CuratedPipeline.curateIncrement(spark, b2, outA, numBuckets = 4, runId = "b2r")
    CuratedPipeline.run(spark, b1.unionByName(b2), outB,
      numBuckets = 4, snapshotGroups = 1, runId = "full")
    assert(keptState(outA) == keptState(outB),
      "replayed increment must converge to the full-recompute kept corpus")
    assert(labelState(outA) == labelState(outB))
  }

  test("compactIndex folds band increments and drops stale label versions; increments keep working") {
    import spark.implicits._
    val textA = "the quick brown fox jumps over the lazy dog"
    val textB = "pack my box with five dozen liquor jugs today"
    val textC = "sphinx of black quartz judge my vow quickly now"
    val textD = "how vexingly quick daft zebras jump around here"
    val textE = "bright vixens jump while dozy fowl quack loudly"
    val b1 = Seq(CurDoc(10L, "u10", ts("2024-03-01 10:00:00"), textA, "a"),
      CurDoc(20L, "u20", ts("2024-03-01 11:00:00"), textB, "a")).toDF()
    val b2 = Seq(CurDoc(30L, "u30", ts("2024-03-02 10:00:00"), textC, "b"),
      CurDoc(31L, "u31", ts("2024-03-02 11:00:00"), textA, "b")).toDF() // dup of 10
    val b3 = Seq(CurDoc(40L, "u40", ts("2024-03-03 10:00:00"), textD, "c")).toDF()
    val b4 = Seq(CurDoc(5L, "u05", ts("2024-03-04 10:00:00"), textE, "d"),
      CurDoc(6L, "u06", ts("2024-03-04 11:00:00"), textB, "d")).toDF() // demotes 20

    val outA = tmpDir(); val outB = tmpDir()
    CuratedPipeline.run(spark, b1, outA, numBuckets = 4, snapshotGroups = 1, runId = "b1")
    CuratedPipeline.curateIncrement(spark, b2, outA, numBuckets = 4, runId = "b2")
    CuratedPipeline.curateIncrement(spark, b3, outA, numBuckets = 4, runId = "b3")
    assert(CuratedPipeline.indexState(outA) == ((3L, Set(0L, 1L, 2L))))
    assert(new java.io.File(s"$outA/index/labels").listFiles().length == 3)

    CuratedPipeline.compactIndex(spark, outA)
    val bandDirs = new java.io.File(s"$outA/index/bands").listFiles()
      .filter(_.getName.startsWith("increment=")).map(_.getName)
    assert(bandDirs.toSeq == Seq("increment=2"), s"got ${bandDirs.mkString(",")}")
    assert(new java.io.File(s"$outA/index/labels").listFiles().map(_.getName).toSeq == Seq("v3"))

    // the compacted index still drives a correct increment (incl. demotion)
    CuratedPipeline.curateIncrement(spark, b4, outA, numBuckets = 4, runId = "b4")
    CuratedPipeline.run(spark, b1.unionByName(b2).unionByName(b3).unionByName(b4),
      outB, numBuckets = 4, snapshotGroups = 1, runId = "full")
    assert(keptState(outA) == keptState(outB))
    assert(labelState(outA) == labelState(outB))
    assert(keptState(outA).map(_._1) == Seq(5L, 6L, 10L, 30L, 40L))
  }

  test("compactKept folds increment prefixes; build → increment → compact → increment → vacuum stays value-exact") {
    import spark.implicits._
    val textA = "the quick brown fox jumps over the lazy dog"
    val textB = "pack my box with five dozen liquor jugs today"
    val textC = "sphinx of black quartz judge my vow quickly now"
    val textD = "how vexingly quick daft zebras jump around here"
    val textE = "bright vixens jump while dozy fowl quack loudly"
    val b1 = Seq(CurDoc(10L, "u10", ts("2024-03-01 10:00:00"), textA, "a"),
      CurDoc(20L, "u20", ts("2024-03-01 11:00:00"), textB, "a"),
      CurDoc(40L, "u40", ts("2024-03-01 12:00:00"), textD, "a")).toDF()
    val b2 = Seq(CurDoc(30L, "u30", ts("2024-03-02 10:00:00"), textC, "b"),
      CurDoc(31L, "u31", ts("2024-03-02 11:00:00"), textA, "b")).toDF() // dup of 10
    val b3 = Seq(CurDoc(5L, "u05", ts("2024-03-03 10:00:00"), textE, "c"),
      CurDoc(6L, "u06", ts("2024-03-03 11:00:00"), textB, "c")).toDF() // demotes 20

    val outA = tmpDir(); val outB = tmpDir()
    CuratedPipeline.run(spark, b1, outA, numBuckets = 4, snapshotGroups = 1, runId = "b1")
    CuratedPipeline.curateIncrement(spark, b2, outA, numBuckets = 4, runId = "b2")

    // fold base + first increment into compact v1 and reclaim the prefixes
    val keptBefore = keptState(outA)
    assert(CuratedPipeline.compactKept(spark, outA, numBuckets = 4) == 1L)
    assert(keptState(outA) == keptBefore, "fold must not change the visible corpus")
    CuratedPipeline.vacuumKept(spark, outA)
    assert(keptState(outA) == keptBefore, "vacuum must not change the visible corpus")
    // the increment prefixes are physically gone — the listing problem the
    // fold exists for — and the compact layout has no curate_inc dirs
    val dataDirs = Option(new java.io.File(s"$outA/data").listFiles())
      .getOrElse(Array.empty[java.io.File]).filter(_.isDirectory).map(_.getName)
    assert(!dataDirs.exists(_.startsWith("curate_inc=")), s"saw ${dataDirs.mkString(",")}")
    assert(new java.io.File(s"$outA/data_compact/v1").listFiles()
      .filter(_.isDirectory).forall(_.getName.startsWith("part_bucket=")))

    // an increment ACROSS the fold (with a demotion into the compacted
    // base) still equals the full recompute
    CuratedPipeline.curateIncrement(spark, b3, outA, numBuckets = 4, runId = "b3")
    CuratedPipeline.run(spark, b1.unionByName(b2).unionByName(b3), outB,
      numBuckets = 4, snapshotGroups = 1, runId = "full")
    assert(keptState(outA) == keptState(outB))
    assert(keptState(outA).map(_._1) == Seq(5L, 6L, 10L, 30L, 40L))
    assert(labelState(outA) == labelState(outB))

    // a SECOND fold absorbs the post-fold increment too
    assert(CuratedPipeline.compactKept(spark, outA, numBuckets = 4) == 2L)
    CuratedPipeline.vacuumKept(spark, outA)
    assert(keptState(outA) == keptState(outB))
    assert(!new java.io.File(s"$outA/data_compact/v1").exists())
  }

  test("readKeptAsOf reconstructs every increment's view; releaseAsOf pairs it with its labels version") {
    import spark.implicits._
    val textA = "the quick brown fox jumps over the lazy dog"
    val textB = "pack my box with five dozen liquor jugs today"
    val textD = "how vexingly quick daft zebras jump around here"
    val b1 = Seq(CurDoc(10L, "u10", ts("2024-03-01 10:00:00"), textA, "a"),
      CurDoc(20L, "u20", ts("2024-03-01 11:00:00"), textB, "a")).toDF()
    val b2 = Seq(CurDoc(40L, "u40", ts("2024-03-02 10:00:00"), textD, "b"),
      CurDoc(41L, "u41", ts("2024-03-02 11:00:00"), textA, "b")).toDF() // dup of 10
    val b3 = Seq(CurDoc(5L, "u05", ts("2024-03-03 10:00:00"), textB, "c")).toDF() // demotes 20

    val out = tmpDir()
    CuratedPipeline.run(spark, b1, out, numBuckets = 4, snapshotGroups = 1, runId = "b1")
    val v0 = keptState(out)
    CuratedPipeline.curateIncrement(spark, b2, out, numBuckets = 4, runId = "b2")
    val v1 = keptState(out)
    CuratedPipeline.curateIncrement(spark, b3, out, numBuckets = 4, runId = "b3")
    val v2 = keptState(out)
    assert(v0.map(_._1) == Seq(10L, 20L))
    assert(v1.map(_._1) == Seq(10L, 20L, 40L))
    assert(v2.map(_._1) == Seq(5L, 10L, 40L)) // 20 demoted by 5

    assert(CuratedPipeline.keptSnapshots(out) == Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    def asOf(k: Long) = CuratedPipeline.readKeptAsOf(spark, out, k)
      .select($"id", $"text").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(asOf(0L) == v0, "as-of increment 0 must equal what readKept returned then")
    assert(asOf(1L) == v1, "as-of increment 1 must see the pre-demotion canonical")
    assert(asOf(2L) == v2)

    // time travel survives the kept-table fold + vacuum (curate_inc rides
    // along as a data column; deletes stay logical)
    CuratedPipeline.compactKept(spark, out, numBuckets = 4)
    CuratedPipeline.vacuumKept(spark, out)
    assert(asOf(0L) == v0 && asOf(1L) == v1 && asOf(2L) == v2,
      "per-snapshot kept sets must survive kept-table compaction")

    // release cut: labels version paired with the increment; the older cut
    // still shows 20 as its own canonical, the newer one shows 20 → 5
    val (k1, l1) = CuratedPipeline.releaseAsOf(spark, out, 1L)
    assert(k1.select($"id").as[Long].collect().sorted.toSeq == Seq(10L, 20L, 40L))
    assert(l1.filter($"id" === 20L).select($"comp").as[Long].head() == 20L)
    val (k2, l2) = CuratedPipeline.releaseAsOf(spark, out, 2L)
    assert(k2.select($"id").as[Long].collect().sorted.toSeq == Seq(5L, 10L, 40L))
    assert(l2.filter($"id" === 20L).select($"comp").as[Long].head() == 5L)

    // compactIndex with keepLabelVersions=1 vacuums v1/v2 → the old
    // release cut fails LOUDLY instead of serving newer labels
    CuratedPipeline.compactIndex(spark, out)
    intercept[IllegalArgumentException] {
      CuratedPipeline.releaseAsOf(spark, out, 1L)
    }
    val (k2b, _) = CuratedPipeline.releaseAsOf(spark, out, 2L) // current survives
    assert(k2b.select($"id").as[Long].collect().sorted.toSeq == Seq(5L, 10L, 40L))
  }

  test("torn curate run resumes and equals the clean run (dedup decision is stable)") {
    import spark.implicits._
    val outClean = tmpDir(); val outTorn = tmpDir()

    CuratedPipeline.run(spark, corpus(), outClean,
      numBuckets = 8, snapshotGroups = 4, runId = "clean")

    // simulate a kill after 2 of 4 snapshots
    CuratedPipeline.run(spark, corpus(), outTorn,
      numBuckets = 8, snapshotGroups = 4, runId = "t1")
    val mf = Paths.get(outTorn, "_manifest", "manifest.jsonl")
    val lines = Files.readAllLines(mf)
    Files.write(mf, String.join("\n", lines.subList(0, 2)).concat("\n").getBytes("UTF-8"))
    assert(ExtractPipeline.committedBuckets(outTorn).size == 4)

    val resumed = CuratedPipeline.run(spark, corpus(), outTorn,
      numBuckets = 8, snapshotGroups = 4, runId = "t2")
    assert(resumed.nonEmpty)
    assert(ExtractPipeline.committedBuckets(outTorn).size == 8)

    val clean = CuratedPipeline.readKept(spark, outClean)
      .select($"id", $"text").as[(Long, String)].collect().sortBy(_._1)
    val torn = CuratedPipeline.readKept(spark, outTorn)
      .select($"id", $"text").as[(Long, String)].collect().sortBy(_._1)
    assert(clean.sameElements(torn), "resumed kept corpus must equal clean run")
  }

  test("flagship composition: pages → extract table → quality gate → kept corpus, torn at either stage") {
    import spark.implicits._
    val n = 300L
    val pages = ExtractStage.generatePages(spark, n, partitions = 8)

    val outClean = tmpDir()
    val (el, cl) = CuratedPipeline.runFromPages(spark, pages, outClean,
      numBuckets = 8, snapshotGroups = 4, runId = "clean")
    assert(el.map(_.input_rows).sum == n)
    val keptClean = CuratedPipeline.readKept(spark, s"$outClean/curated")
      .select($"url", $"extracted_text").as[(String, String)].collect().sortBy(_._1)
    assert(keptClean.nonEmpty)
    assert(cl.map(_.input_rows).sum == keptClean.length,
      "curate lineage must account for exactly the kept rows")

    // every kept row passed the quality gate (success=true survives the read)
    assert(CuratedPipeline.readKept(spark, s"$outClean/curated")
      .filter(!$"success").count() == 0)

    // quality gate: a real minQuality keeps a SUBSET and every kept doc
    // clears the threshold
    val outQ = tmpDir()
    CuratedPipeline.runFromPages(spark, pages, outQ,
      numBuckets = 8, snapshotGroups = 2, runId = "q", minQuality = 0.5)
    val keptQ = CuratedPipeline.readKept(spark, s"$outQ/curated")
    val qScores = keptQ.select(graft.functions.GraftFunctions
      .qualityScore($"extracted_text").as("q")).as[Double].collect()
    assert(qScores.forall(_ >= 0.5), "every kept doc must clear the quality gate")
    // NOT a strict-subset assert: gating runs BEFORE clustering, so
    // removing a cluster's min-id doc promotes a different canonical —
    // the gated kept set can contain urls the ungated one dropped
    assert(keptQ.count() <= keptClean.length,
      "a gate can only shrink the kept corpus")

    // Gopher gate: every kept doc passes ALL rules, and the gate only
    // shrinks the corpus (the q69-oracled rule set as the production gate)
    val outG = tmpDir()
    CuratedPipeline.runFromPages(spark, pages, outG,
      numBuckets = 8, snapshotGroups = 2, runId = "gopher", gopherGate = true)
    val keptG = CuratedPipeline.readKept(spark, s"$outG/curated")
    assert(keptG.count() <= keptClean.length)
    assert(keptG.filter(!graft.functions.GraftFunctions
      .gopherQuality($"extracted_text").getField("pass")).count() == 0,
      "every kept doc must pass the full Gopher rule set")
    // the gate is exactly gopherQuality().pass over the pre-dedup input:
    // kept count can never exceed the extract table's pass count
    val passCount = ExtractPipeline.readOutput(spark, s"$outG/extract")
      .filter($"success" && !$"noindex")
      .filter(graft.functions.GraftFunctions
        .gopherQuality($"extracted_text").getField("pass")).count()
    assert(keptG.count() <= passCount && keptG.count() > 0)

    // PII scrub: no raw email/IP/phone survives into the released corpus
    val outP = tmpDir()
    CuratedPipeline.runFromPages(spark, pages, outP,
      numBuckets = 8, snapshotGroups = 2, runId = "pii", scrubPii = true)
    val keptP = CuratedPipeline.readKept(spark, s"$outP/curated")
    assert(keptP.columns.contains("pii_redactions"))
    import graft.core.rules.PiiScrubber
    val leaked = keptP.filter(
      $"extracted_text".rlike(PiiScrubber.EmailPattern) ||
      $"extracted_text".rlike(PiiScrubber.Ipv4Pattern) ||
      $"extracted_text".rlike(PiiScrubber.PhonePattern)).count()
    assert(leaked == 0, "scrubPii must leave no raw PII in the kept corpus")
    // redaction counts agree with re-scrubbing the ORIGINAL extracted text
    val recount = ExtractPipeline.readOutput(spark, s"$outP/extract")
      .filter($"success")
      .select(sum(graft.functions.GraftFunctions.piiScrub($"extracted_text")
        .getField("n_emails")).cast("long")).as[Long].head()
    val kept_e = keptP.select(sum($"pii_redactions").cast("long")).as[Long].head()
    assert(kept_e >= 0 && (recount == 0 || kept_e <= recount * 3))

    // torn during CURATE: extract complete, curated manifest truncated
    val outT1 = tmpDir()
    CuratedPipeline.runFromPages(spark, pages, outT1,
      numBuckets = 8, snapshotGroups = 4, runId = "t1")
    val mfC = Paths.get(outT1, "curated", "_manifest", "manifest.jsonl")
    val linesC = Files.readAllLines(mfC)
    Files.write(mfC, String.join("\n", linesC.subList(0, 1)).concat("\n").getBytes("UTF-8"))
    CuratedPipeline.runFromPages(spark, pages, outT1,
      numBuckets = 8, snapshotGroups = 4, runId = "t1r")
    val keptT1 = CuratedPipeline.readKept(spark, s"$outT1/curated")
      .select($"url", $"extracted_text").as[(String, String)].collect().sortBy(_._1)
    assert(keptClean.sameElements(keptT1),
      "curate-stage torn run must converge to the clean kept corpus")

    // torn during EXTRACT: curate stage never started
    val outT2 = tmpDir()
    ExtractPipeline.run(spark, pages, s"$outT2/extract",
      numBuckets = 8, snapshotGroups = 4, runId = "t2")
    val mfE = Paths.get(outT2, "extract", "_manifest", "manifest.jsonl")
    val linesE = Files.readAllLines(mfE)
    Files.write(mfE, String.join("\n", linesE.subList(0, 2)).concat("\n").getBytes("UTF-8"))
    CuratedPipeline.runFromPages(spark, pages, outT2,
      numBuckets = 8, snapshotGroups = 4, runId = "t2r")
    val keptT2 = CuratedPipeline.readKept(spark, s"$outT2/curated")
      .select($"url", $"extracted_text").as[(String, String)].collect().sortBy(_._1)
    assert(keptClean.sameElements(keptT2),
      "extract-stage torn run must converge to the clean kept corpus")
  }
}
