package graft.core

/** Scratch diagnostics — run with `sbt "Test/runMain graft.core.DebugMain"`. */
object DebugMain {
  def main(args: Array[String]): Unit = {
    var misses = 0
    (0L until 200L).foreach { i =>
      val p = graft.pipeline.PageGen.page(42L, i)
      val r = ExtractCore.processPage(p.html, p.text)
      if (r.record.products.isEmpty && misses < 3) {
        misses += 1
        println(s"=== row $i kind=${graft.pipeline.PageGen.kind(42L, i)} url=${p.url}")
        println("--- extracted text ---")
        println(r.extractedText.take(1500))
        println("--- record: " + r.record.copy(confidence = Map.empty))
      } else if (r.record.products.isEmpty) misses += 1
    }
    println(s"total misses: $misses")
  }
}
