package graft.core.rules

import graft.core.ExtractionRecord

/** F15 — required-field validation (semantics of
  * /root/reference/invoice_processor.py:822-881). Pure: returns the error
  * list and the (possibly scrubbed) record; the reference mutates in place.
  */
object Validator {

  final case class Result(record: ExtractionRecord, errors: List[String]) {
    def isValid: Boolean = errors.isEmpty
  }

  private def missing(v: String): Boolean = v == null || v.isEmpty

  def validate(rec0: ExtractionRecord): Result = {
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    var rec = rec0

    // required fields (reference treats "" / missing as invalid; "N/A" passes
    // the presence check — only products get the N/A-suspicion rule)
    if (missing(rec.companyName)) errors += "Missing required field: company_name"
    if (missing(rec.invoiceNumber)) errors += "Missing required field: invoice_number"
    if (missing(rec.invoiceDate)) errors += "Missing required field: invoice_date"

    // company name: strip M/s prefix (the fuzzy identifier match at :846-851
    // is dead code — no template defines identifiers — reproduced as no-op)
    if (rec.companyName != null)
      rec = rec.copy(companyName = FieldRules.stripMsPrefix(rec.companyName))

    // invoice number: must contain a digit; scrub to alphanumeric
    if (rec.invoiceNumber != null && rec.invoiceNumber != "N/A") {
      if (!FieldRules.invoiceNumberHasDigit(rec.invoiceNumber))
        errors += s"Invoice number '${rec.invoiceNumber}' doesn't contain any digits"
      rec = rec.copy(invoiceNumber = FieldRules.scrubInvoiceNumber(rec.invoiceNumber))
    }

    // products
    if (rec.products.isEmpty) errors += "No products extracted"
    else rec.products.zipWithIndex.foreach { case (p, i) =>
      val fields = List(
        "goods_description" -> p.goodsDescription, "quantity" -> p.quantity,
        "rate" -> p.rate, "amount" -> p.amount)
      fields.foreach { case (name, v) =>
        if ((v == null || v.isEmpty || v == "N/A") &&
            List("quantity", "rate", "amount").contains(name) && v == "N/A")
          errors += s"Product ${i + 1} has suspicious '$name' value: $v"
      }
    }

    Result(rec, errors.toList)
  }
}
