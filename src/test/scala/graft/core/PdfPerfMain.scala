package graft.core

import graft.pipeline.PageGen

/** Micro-timer for the PDF path: per-doc extract cost over the generator's
  * three PDF shapes. Usage: `sbt "Test/runMain graft.core.PdfPerfMain"`.
  */
object PdfPerfMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    val text = (1 to 12).map(k => s"Invoice line $k : value ${k * 37}").mkString("\n")
    val docs = Seq(
      "plain" -> PageGen.pdfBytes(text, flate = false),
      "flate" -> PageGen.pdfBytes(text, flate = true),
      "tounicode" -> PageGen.subsetFontPdfBytes(text, twoByte = false))
    // warm
    docs.foreach { case (_, b) => (1 to 2000).foreach(_ => graft.core.pdf.PdfTextExtractor.extract(b)) }
    docs.foreach { case (name, b) =>
      val t0 = System.nanoTime()
      var i = 0
      var acc = 0
      while (i < n) { acc += graft.core.pdf.PdfTextExtractor.extract(b).length; i += 1 }
      val us = (System.nanoTime() - t0) / 1000.0 / n
      println(f"[pdfperf] $name%-10s $us%8.1f us/doc (len acc $acc)")
    }
  }
}
