package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.rules.PiiScrubber

/** Pinned redaction semantics for the PII scrubber (the q75 operator and
  * CuratedPipeline's `scrubPii` gate share these exact patterns).
  */
class PiiSpec extends AnyFunSuite {

  test("emails redact with count") {
    val r = PiiScrubber.scrub("write to alice.b+spam@sub.example.co.uk or bob@x.io!")
    assert(r.text == "write to <EMAIL> or <EMAIL>!")
    assert(r.nEmails == 2 && r.nIps == 0 && r.nPhones == 0)
  }

  test("IPv4s redact; version strings and decimals survive") {
    val r = PiiScrubber.scrub("host 192.168.0.17 and 10.0.0.1, but v1.2 stays, pi=3.14")
    assert(r.text == "host <IP> and <IP>, but v1.2 stays, pi=3.14")
    assert(r.nIps == 2)
    // over-redaction of out-of-range quads is by design (safe direction)
    assert(PiiScrubber.scrub("999.999.999.999").text == "<IP>")
  }

  test("phone shapes redact; years and bare integers survive") {
    val r = PiiScrubber.scrub("call +1 555-123-4567 or 0171.555.1234 in 2024, ref 12345678")
    assert(r.text == "call <PHONE> or <PHONE> in 2024, ref 12345678")
    assert(r.nPhones == 2)
  }

  test("fixed order: a dotted quad is an <IP>, never a half-eaten phone") {
    val r = PiiScrubber.scrub("from 203.120.115.211 at 555-123-4567")
    assert(r.text == "from <IP> at <PHONE>")
    assert(r.nIps == 1 && r.nPhones == 1)
  }

  test("mixed text: counts per type, clean text stable under re-scrub") {
    val s = "mail a@b.de, ip 8.8.8.8, tel +49 030-1234-5678 end"
    val r = PiiScrubber.scrub(s)
    assert(r.text == "mail <EMAIL>, ip <IP>, tel <PHONE> end")
    assert((r.nEmails, r.nIps, r.nPhones) == ((1, 1, 1)) && r.total == 3)
    // idempotent: tokens contain no scrubbables
    val r2 = PiiScrubber.scrub(r.text)
    assert(r2.text == r.text && r2.total == 0)
  }

  test("golden edge doc: extraction preserves planted PII; scrub redacts exactly those spans") {
    val (_, r) = GoldenFixtures.computeEdge("pii_in_body")
    // extraction is fidelity-first: the raw PII must survive into the
    // extracted text byte-identically (pinned by the golden fixture gate)
    assert(r.extractedText.contains("sales.team+eu@acme-corp.example"))
    assert(r.extractedText.contains("+1 555-010-4242"))
    assert(r.extractedText.contains("198.51.100.23"))
    // the scrub then redacts EXACTLY the three planted spans and nothing else
    val s = graft.core.rules.PiiScrubber.scrub(r.extractedText)
    assert((s.nEmails, s.nIps, s.nPhones) == ((1, 1, 1)))
    assert(s.text == r.extractedText
      .replace("sales.team+eu@acme-corp.example", "<EMAIL>")
      .replace("+1 555-010-4242", "<PHONE>")
      .replace("198.51.100.23", "<IP>"))
  }

  test("null and clean text pass through") {
    assert(PiiScrubber.scrub(null).text == null)
    val clean = "the quick brown fox jumps over the lazy dog"
    val r = PiiScrubber.scrub(clean)
    assert(r.text == clean && r.total == 0)
  }
}
