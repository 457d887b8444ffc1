package graft.core.text

/** Unicode normalization for text-pipeline canonicalization: NFC collapses
  * decomposed sequences (`e` + U+0301 combining acute) into their composed
  * form (`é`), so hashing/dedup/tokenization see one spelling of visually
  * identical text — the standard first step before any content hashing on
  * crawled text, where the two encodings arrive mixed (editor and CMS
  * dependent).
  *
  * Delegates to `java.text.Normalizer` (the JDK's implementation of
  * UAX #15); kept as a tiny static so the codegen'd Catalyst expression
  * ([[graft.functions.NfcNormalize]]) can call it directly from generated
  * Java.
  */
object UnicodeNorm {

  /** NFC (canonical composition). Null-hostile by contract (the Catalyst
    * wrapper handles nulls before the call).
    */
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
}
