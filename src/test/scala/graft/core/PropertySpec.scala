package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.rules._
import graft.core.html.{Boilerplate, HtmlTokenizer}

/** Property-based tests (SURVEY.md §5.2.3): totality, idempotence,
  * alphabet closure, span well-formedness — over generated inputs.
  * Sampling is deterministic (fixed scalacheck seeds) so failures are
  * reproducible; only scalatest + scalacheck are used (no scalatestplus
  * bridge in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 300): Seq[T] =
    (0 until n).flatMap(k => g.apply(Gen.Parameters.default, Seed(k.toLong)))

  private val anyString = Gen.asciiPrintableStr
  private val unicodeString = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', '\n', '\t', '|', '-', '/', '.', '₹', '§', '&', '<', '>'),
    Gen.choose(' ', '퟿'))).map(_.mkString)

  test("URL normalization is total and idempotent; resolution output re-resolves to itself") {
    import graft.core.html.UrlResolver
    val messyUrl = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS")
      host <- Gen.oneOf("Ex.COM", "www.site.org", "A.b.C")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/A/b", "/p%20q", "/x/../y", "/dir/")
      query <- Gen.oneOf("", "?id=1", "?utm_source=x", "?utm_a=1&id=2&gclid=z", "?a=1&b=2")
      frag <- Gen.oneOf("", "#f", "#a/b?c")
    } yield s"$scheme://$host$port$path$query$frag"
    samples(messyUrl, 200).foreach { u =>
      val once = UrlResolver.normalizeUrl(u)
      assert(UrlResolver.normalizeUrl(once) == once, s"not idempotent for '$u' -> '$once'")
    }
    // arbitrary garbage never throws
    samples(unicodeString, 200).foreach { s => UrlResolver.normalizeUrl(s) }
    // resolve() output is absolute: resolving it against any base is identity
    samples(messyUrl, 100).foreach { u =>
      val abs = UrlResolver.resolve("http://base.example/dir/page", u)
      if (abs.nonEmpty)
        assert(UrlResolver.resolve("http://other.example/", abs) == abs,
          s"resolved '$u' -> '$abs' is not a fixed point")
    }
  }

  test("date normalizer is total and idempotent on normalized output") {
    samples(unicodeString).foreach { s =>
      val once = FieldRules.normalizeDate(s) // must not throw
      if (once != null && once.matches("\\d{1,2}/\\d{1,2}/\\d{4}"))
        assert(FieldRules.normalizeDate(once) == once)
    }
  }

  test("weight conversion is total; known units always convert, non-negative") {
    samples(anyString).foreach(s => FieldRules.convertWeightToKg(s))
    val cases = for {
      v <- samples(Gen.choose(0.0, 1e6), 100)
      u <- Seq("kg", "qtl", "ton", "tons", "Kg", "QTL")
    } yield (v, u)
    cases.foreach { case (v, u) =>
      FieldRules.convertWeightToKg(f"$v%.2f $u") match {
        case Right(kg) => assert(kg >= 0)
        case Left(orig) => fail(s"known unit '$u' must convert, got passthrough of '$orig'")
      }
    }
  }

  test("scrubbers are idempotent projections with closed output alphabets") {
    samples(unicodeString).foreach { s =>
      val inv = FieldRules.scrubInvoiceNumber(s)
      assert(inv.forall(c => c.isLetterOrDigit && c < 128))
      assert(FieldRules.scrubInvoiceNumber(inv) == inv)

      val hsn = FieldRules.scrubHsn(s)
      assert(hsn == "N/A" || hsn.forall(_.isDigit))

      val money = FieldRules.scrubMoney(s)
      assert(money.forall(c => c.isDigit || c == '.' || c == ',' || c == '₹' || c == '$'))
      assert(FieldRules.scrubMoney(money) == money)
    }
  }

  test("tokenizer and entity decoder are total on arbitrary input") {
    samples(unicodeString).foreach { s =>
      HtmlTokenizer.tokenize(s)
      HtmlTokenizer.decodeEntities(s)
    }
    assert(HtmlTokenizer.decodeEntities("&#65;&#x42;") == "AB")
    // HTML5 numeric-reference replacement: out-of-range → U+FFFD
    assert(HtmlTokenizer.decodeEntities("&#x110000;") == "�")
  }

  test("boilerplate spans are in-bounds, ordered, non-overlapping, and tile the text") {
    samples(Gen.choose(0L, 100000L), 60).foreach { i =>
      val html = graft.pipeline.PageGen.htmlPage(42L, i)
      val ex = Boilerplate.extract(html)
      var prevEnd = 0
      var first = true
      ex.spans.foreach { sp =>
        assert(sp.start >= (if (first) 0 else prevEnd) && sp.end >= sp.start && sp.end <= ex.text.length)
        prevEnd = sp.end; first = false
      }
      val rebuilt = ex.spans.map(sp => ex.text.substring(sp.start, sp.end)).mkString("\n")
      assert(rebuilt == ex.text)
    }
  }

  test("pattern classifier is total with confidence in [0,1]") {
    samples(unicodeString).foreach { s =>
      val (key, conf) = PatternClassifier.classify(s)
      assert(key.nonEmpty && conf >= 0.0 && conf <= 1.0)
    }
  }

  test("page generation is a pure function of (seed, index)") {
    samples(Gen.choose(0L, 1000000L), 100).foreach { i =>
      val a = graft.pipeline.PageGen.page(7L, i)
      val b = graft.pipeline.PageGen.page(7L, i)
      assert(a.url == b.url && a.html.sameElements(b.html) && a.warc_ts == b.warc_ts)
    }
  }
}
