package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.PageGen
import java.nio.charset.StandardCharsets.UTF_8

class ExtractCoreSpec extends AnyFunSuite {

  test("end-to-end over 200 generated pages: high success, fields extracted") {
    var ok = 0; var withProducts = 0; var withInvoiceNo = 0; var withCompany = 0
    (0L until 200L).foreach { i =>
      val p = PageGen.page(42L, i)
      val r = ExtractCore.processPage(p.html, p.text)
      if (r.record.success) ok += 1
      if (r.record.products.nonEmpty) withProducts += 1
      if (r.record.invoiceNumber != "N/A" && r.record.invoiceNumber.nonEmpty) withInvoiceNo += 1
      if (r.record.companyName != "N/A" && r.record.companyName.nonEmpty) withCompany += 1
    }
    assert(ok == 200, s"expected all successes, got $ok")
    assert(withProducts >= 180, s"products found on $withProducts/200")
    assert(withInvoiceNo >= 190, s"invoice number on $withInvoiceNo/200")
    assert(withCompany >= 190, s"company on $withCompany/200")
  }

  test("pdf pages extract the same fields as their html twins") {
    // kinds 10/11 are PDFs of mainContent(i); extraction must find the fields
    var checked = 0
    var i = 0L
    while (checked < 10 && i < 3000L) {
      if (PageGen.kind(42L, i) == 10 || PageGen.kind(42L, i) == 11) {
        val p = PageGen.page(42L, i)
        val r = ExtractCore.processPage(p.html, p.text)
        assert(r.record.success)
        assert(r.record.invoiceNumber.nonEmpty && r.record.invoiceNumber != "N/A",
          s"row $i: ${r.record}")
        checked += 1
      }
      i += 1
    }
    assert(checked == 10)
  }

  test("empty payload falls back to text column (S4 policy)") {
    val r = ExtractCore.processPage(Array.empty, "fallback body text\nInvoice No. : 42")
    assert(r.extractedText.startsWith("fallback body text"))
    assert(r.spans.head.label == "fallback")
    val r2 = ExtractCore.processPage(Array.empty, "")
    assert(!r2.record.success)
    assert(r2.record.error == "Could not extract text from PDF")
  }

  test("determinism: byte-identical text across repeated runs") {
    (0L until 50L).foreach { i =>
      val p = PageGen.page(42L, i)
      val a = ExtractCore.processPage(p.html, p.text)
      val b = ExtractCore.processPage(p.html, p.text)
      assert(a.extractedText.getBytes(UTF_8).sameElements(b.extractedText.getBytes(UTF_8)))
      assert(a.record == b.record)
    }
  }

  test("weight conversion lands in typed column") {
    var found = 0
    (0L until 300L).foreach { i =>
      val p = PageGen.page(42L, i)
      val r = ExtractCore.processPage(p.html, p.text)
      r.record.products.foreach { pr =>
        pr.weightInKg.foreach { kg => assert(kg > 0); found += 1 }
      }
    }
    assert(found > 50, s"expected many kg conversions, got $found")
  }
}
