package graft.core

/** One extracted product row (schema of the reference's products array,
  * /root/reference/invoice_processor.py:569-577 example + :1342-1355
  * cleanup). `weightInKg` is the typed companion of the reference's
  * mixed float-or-string `weight_in_kg`: None when the reference would
  * pass the original string through.
  */
final case class Product(
    goodsDescription: String,
    hsnSacCode: String,
    quantity: String,
    weight: String,
    originalWeight: String,
    weightInKg: Option[Double],
    rate: String,
    amount: String)

/** Full per-document extraction record (reference result dict,
  * /root/reference/invoice_processor.py:1357-1365 + app.py:78-79).
  */
final case class ExtractionRecord(
    success: Boolean,
    error: String,
    patternUsed: String,
    companyName: String,
    invoiceNumber: String,
    fssaiNumber: String,
    invoiceDate: String,
    products: List[Product],
    confidence: Map[String, Double])

object ExtractionRecord {
  def failure(error: String): ExtractionRecord =
    ExtractionRecord(success = false, error = error, patternUsed = "",
      companyName = "N/A", invoiceNumber = "N/A", fssaiNumber = "N/A",
      invoiceDate = "N/A", products = Nil, confidence = Map.empty)
}
