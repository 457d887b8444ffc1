package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.rules._

/** Unit tests per SURVEY.md §5.2.2 — cases lifted from the reference's own
  * embedded examples (cited per test).
  */
class RulesSpec extends AnyFunSuite {

  // F5 — invoice_processor.py:1245-1252
  test("weight conversion: qtl ×100, ton ×1000, kg identity, unknown passthrough") {
    assert(FieldRules.convertWeightToKg("5 qtl") == Right(500.0))
    assert(FieldRules.convertWeightToKg("2.5 tons") == Right(2500.0))
    assert(FieldRules.convertWeightToKg("5000 kg") == Right(5000.0))
    assert(FieldRules.convertWeightToKg("1,250 kg") == Right(1250.0))
    assert(FieldRules.convertWeightToKg("12 bags") == Left("12 bags"))
    assert(FieldRules.convertWeightToKg("N/A") == Left("N/A"))
    assert(FieldRules.convertWeightToKg("heavy") == Left("heavy"))
  }

  // F6 — invoice_processor.py:1021-1056
  test("date normalization: DMY kept, YMD reordered, 2-digit pivot at 30") {
    assert(FieldRules.normalizeDate("26/06/2023") == "26/06/2023")
    assert(FieldRules.normalizeDate("26-06-2023") == "26/06/2023")
    assert(FieldRules.normalizeDate("2023-06-15") == "23/06/2015") // quirk: search matches "23-06-15" first
    assert(FieldRules.normalizeDate("5/7/23") == "5/7/2023")       // <30 → +2000; no zero-padding
    assert(FieldRules.normalizeDate("5/7/85") == "5/7/1985")       // ≥30 → +1900
    // month-name branch is dead after the scrub (letters → spaces) — quirk
    assert(FieldRules.normalizeDate("21st June, 2023") == "21st June, 2023")
    assert(FieldRules.normalizeDate("no date here") == "no date here")
  }

  // F7
  test("invoice number scrub keeps alphanumerics only, digit check") {
    assert(FieldRules.scrubInvoiceNumber("INV-78/0#") == "INV780")
    assert(FieldRules.invoiceNumberHasDigit("INV-780"))
    assert(!FieldRules.invoiceNumberHasDigit("INVOICE"))
  }

  // F8, F9, F10
  test("scrubbers: hsn digits-only, quantity digits-dot, money keeps ₹$,.") {
    assert(FieldRules.scrubHsn("HSN 1006-30") == "100630")
    assert(FieldRules.scrubHsn("none") == "N/A")
    assert(FieldRules.scrubQuantity("500 bags") == "500")
    assert(FieldRules.scrubQuantity("79.82 MT") == "79.82")
    assert(FieldRules.scrubQuantity("x") == "N/A")
    assert(FieldRules.scrubMoney("₹1,075,000.50/-") == "₹1,075,000.50")
    assert(FieldRules.scrubMoney("$ 200 only") == "$200")
  }

  test("scrubbers are idempotent (projection property)") {
    val inputs = List("INV-78/0#", "HSN 1006-30", "500 bags", "₹1,075,000.50/-", "", "N/A")
    inputs.foreach { s =>
      assert(FieldRules.scrubInvoiceNumber(FieldRules.scrubInvoiceNumber(s)) == FieldRules.scrubInvoiceNumber(s))
      assert(FieldRules.scrubMoney(FieldRules.scrubMoney(s)) == FieldRules.scrubMoney(s))
    }
  }

  // F11 — invoice_processor.py:999-1011
  test("FSSAI recovery patterns") {
    assert(FieldRules.recoverFssai("FSSAI No. : 12345678901234") == Some("12345678901234"))
    assert(FieldRules.recoverFssai("fssai # 1234567890") == Some("1234567890"))
    assert(FieldRules.recoverFssai("Food License: 12345678901") == Some("12345678901"))
    assert(FieldRules.recoverFssai("FSSAI: 123") == None) // too short
  }

  // F12 — invoice_processor.py:934-989
  test("company recovery: M/s prefix kept with bonus, longest wins") {
    val text = "Some header\nM/s SHRI BIRLA RICE MILL\nGSTIN 22AAAA\n"
    // original case preserved (reference reads from the original line)
    assert(FieldRules.recoverCompany(text) == Some("M/s SHRI BIRLA RICE MILL"))
    val text2 = "AGRO CORNER\nSUNRISE AGRO INDUSTRIES\n"
    val got = FieldRules.recoverCompany(text2)
    assert(got.exists(_.contains("AGRO")))
    assert(FieldRules.shouldRecoverCompany("N/A"))
    assert(FieldRules.shouldRecoverCompany("RICE MILL"))
    assert(!FieldRules.shouldRecoverCompany("GOLDEN HARVEST RICE MILL"))
  }

  // F1 — invoice_processor.py:307-408
  test("pattern classifier: detected columns path with floor 0.4") {
    val text = "header\n--- TABLE 1.1 ---\nDESCRIPTION | HSN | BAGS | NET | Rate | Amount\nRICE | 1006 | 200 | 5000 | 2000 | 100000\n"
    val (key, conf) = PatternClassifier.classify(text)
    assert(key.startsWith("pattern_"))
    assert(key.contains(":BAGS:NET:RATE"))
    assert(conf >= 0.4)
  }

  test("pattern classifier: generic floor 0.3 when nothing matches") {
    val (key, conf) = PatternClassifier.classify("just some prose without tables")
    assert(key == "generic")
    assert(conf == 0.3)
  }

  test("pattern classifier: first-match-wins column roles (NET is weight not qty)") {
    val headers = Seq("DESCRIPTION", "HSN", "BAGS", "NET (KG) PER BAG", "NET", "RATE", "AMOUNT")
    val d = PatternClassifier.detectColumns(headers)
    assert(d.quantityCol == Some("BAGS"))
    // dict overwrite: later NET column wins the weight slot
    assert(d.weightCol == Some("NET"))
    assert(d.rateCol == Some("RATE"))
    assert(d.amountCol == Some("AMOUNT"))
    assert(d.descCol == Some("DESCRIPTION"))
  }

  // F2 — invoice_processor.py:672-701
  test("table parser recovers rows from TABLE sections") {
    val text = "prose\n--- TABLE 1.1 ---\nA | B | C\n1 | 2 | 3\nnot a row\n4 | 5 | 6\n"
    val tables = TableParser.parse(text)
    assert(tables == List(List(List("A", "B", "C"), List("1", "2", "3"), List("4", "5", "6"))))
  }

  // F3 — invoice_processor.py:593-669 (fractional-part quirk)
  test("column profiler: value range tracks the FRACTIONAL part only (reference quirk)") {
    val text = "H1 | H2 | QTY | RATE\nx | y | 10.25 | 99\nx | y | 3.5 | 88.75\n"
    val out = ColumnProfiler.profile(text)
    assert(out.contains("Found columns: \"H1\", \"H2\", \"QTY\", \"RATE\""))
    // 10.25 → .25, 3.5 → .5 ⇒ range 0.25..0.5; integer 99 contributes nothing
    assert(out.contains("Column 'QTY': QUANTITY (count of items/bags) - Value range: 0.25 to 0.5"))
    assert(out.contains("Column 'RATE': RATE (price per unit) - Value range: 0.75 to 0.75"))
  }

  // F4 — invoice_processor.py:1084-1218
  test("table locator: birla branch captures until total marker") {
    val text = "M/s SHRI BIRLA RICE MILL\nsome prose\n" +
      "DESCRIPTION HSN BATCH WEIGHT\nSTEAM RICE 1006 B1 5000\nGRAND TOTAL 100000\nafter\n"
    val got = TableLocator.locate(text)
    assert(got.contains("DESCRIPTION HSN BATCH WEIGHT"))
    assert(got.contains("GRAND TOTAL"))
    assert(!got.contains("after"))
  }

  test("table locator: generic cluster branch") {
    val text = "prose " * 20 + "\nDESCRIPTION QTY RATE AMOUNT\nrice 10 20 200\nTOTAL 200\ntrailing\n"
    val got = TableLocator.locate(text)
    assert(got.contains("DESCRIPTION QTY RATE AMOUNT"))
    assert(got.contains("TOTAL"))
  }

  // F20 — invoice_processor.py:450-457
  test("format sniffer predicates") {
    assert(FieldMapper.sniff("has NET (Kg) PER BAG col") == FieldMapper.ProblematicFormat)
    assert(FieldMapper.sniff("BAGS NET RATE present") == FieldMapper.ProblematicFormat)
    assert(FieldMapper.sniff("BAG PKG QUANTITY PER cols") == FieldMapper.AgroFormat)
    assert(FieldMapper.sniff("A M AGRO invoice") == FieldMapper.AgroFormat)
    assert(FieldMapper.sniff("plain invoice") == FieldMapper.GenericFormat)
  }

  // prompt example — invoice_processor.py:488-503
  test("field mapper: problematic format maps BAGS→qty, NET→weight, excludes PER BAG") {
    val table = List(
      List("Description", "HSN", "BAGS", "NET (Kg) PER BAG", "NET", "Rate", "Amount"),
      List("STEAM RICE", "123", "200", "25", "5000", "2000", "100000"))
    val ps = FieldMapper.mapTable(table, FieldMapper.ProblematicFormat)
    assert(ps.length == 1)
    val p = ps.head
    assert(p.goodsDescription == "STEAM RICE")
    assert(p.hsnSacCode == "123")
    assert(p.quantity == "200")
    assert(p.weight == "5000 kg")
    assert(p.rate == "2000")
    assert(p.amount == "100000")
  }

  // prompt example — invoice_processor.py:535-549
  test("field mapper: agro format maps QUANTITY→qty in MT") {
    val table = List(
      List("Description", "HSN/SAC", "Batch", "Bag", "Pkg", "Quantity", "Rate", "Per", "Amount"),
      List("Loose Rice", "1006309", "511", "307", "0.26", "79.82", "4850", "KGS", "387127"))
    val ps = FieldMapper.mapTable(table, FieldMapper.AgroFormat)
    assert(ps.length == 1)
    val p = ps.head
    assert(p.goodsDescription == "Loose Rice")
    assert(p.hsnSacCode == "1006309")
    assert(p.quantity == "79.82 MT")
    assert(p.rate == "4850")
    assert(p.amount == "387127")
  }

  // F15 — invoice_processor.py:822-881
  test("validator: N/A numeric product fields are suspicious") {
    val rec = ExtractionRecord(success = true, error = null, patternUsed = "",
      companyName = "M/s FOO RICE MILL", invoiceNumber = "INV-78",
      fssaiNumber = "N/A", invoiceDate = "26/06/2023",
      products = List(Product("RICE", "1006", "N/A", "5 qtl", "5 qtl", None, "2000", "100000")),
      confidence = Map.empty)
    val res = Validator.validate(rec)
    assert(res.errors.exists(_.contains("suspicious 'quantity'")))
    assert(res.record.companyName == "FOO RICE MILL") // M/s stripped
    assert(res.record.invoiceNumber == "INV78")       // scrubbed
  }
}
