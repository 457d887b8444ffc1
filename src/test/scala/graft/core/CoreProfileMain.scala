package graft.core

import graft.pipeline.PageGen

/** Stage-level core profiler: where does the 0.4 ms/page go? */
object CoreProfileMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5000
    val htmlPages = (0 until n).map(i => PageGen.htmlPage(42L, i.toLong)).toArray
    val texts = htmlPages.map(h => graft.core.html.Boilerplate.extract(h).text)

    def time(label: String, reps: Int = 3)(f: => Unit): Unit = {
      var best = Double.MaxValue
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[core] $label: ${n / best}%.0f pages/sec (${best * 1e6 / n}%.1f us/page)")
    }

    // warmup
    htmlPages.take(500).foreach { h =>
      val t = graft.core.html.Boilerplate.extract(h).text
      ExtractCore.processPage(h.getBytes("UTF-8"), null)
      rules.PatternClassifier.classify(t)
    }

    time("tokenize") { htmlPages.foreach(graft.core.html.HtmlTokenizer.tokenize) }
    time("tokenize+segment") { htmlPages.foreach(graft.core.html.BlockSegmenter.segment) }
    time("boilerplate full") { htmlPages.foreach(graft.core.html.Boilerplate.extract) }
    time("pattern classify") { texts.foreach(rules.PatternClassifier.classify) }
    time("field extract (sniff+map+validate)") {
      texts.foreach { t =>
        val f = rules.FieldMapper.sniff(t)
        rules.Validator.validate(rules.FieldMapper.extract(t, f))
      }
    }
    time("post-process") {
      texts.foreach { t =>
        val f = rules.FieldMapper.sniff(t)
        ExtractCore.postProcess(rules.FieldMapper.extract(t, f), t)
      }
    }
    time("recoverCompany only") { texts.foreach(rules.FieldRules.recoverCompany) }
    time("recoverFssai only") { texts.foreach(rules.FieldRules.recoverFssai) }
    time("normalizeDate only") { texts.foreach(t => rules.FieldRules.normalizeDate(t.take(30))) }
    time("processPage end-to-end") {
      htmlPages.foreach(h => ExtractCore.processPage(h.getBytes("UTF-8"), null))
    }
  }
}
