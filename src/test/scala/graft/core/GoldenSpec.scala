package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8

/** The byte-identical invariant (north rule / FIXTURES.md §2): extracted
  * text AND the structured record must equal the committed fixtures
  * byte-for-byte, per url.
  */
class GoldenSpec extends AnyFunSuite {
  import GoldenFixtures._

  test("golden fixtures exist") {
    assert(Files.exists(dir), s"run `sbt \"Test/runMain graft.core.GoldenGen\"` once to create $dir")
    assert(pinnedRows.nonEmpty)
  }

  pinnedRows.foreach { i =>
    test(s"row $i: extracted text is byte-identical to fixture") {
      val (_, r) = compute(i)
      val expected = Files.readAllBytes(dir.resolve(s"row$i.txt"))
      val actual = r.extractedText.getBytes(UTF_8)
      assert(actual.sameElements(expected),
        s"text drift on row $i:\n--- expected(${expected.length}B)\n${new String(expected, UTF_8).take(400)}\n--- actual(${actual.length}B)\n${r.extractedText.take(400)}")
    }

    test(s"row $i: structured record is byte-identical to fixture") {
      val (url, r) = compute(i)
      val expected = Files.readAllBytes(dir.resolve(s"row$i.json"))
      val actual = recordJson(url, r).getBytes(UTF_8)
      assert(actual.sameElements(expected),
        s"record drift on row $i:\nexpected: ${new String(expected, UTF_8).take(600)}\nactual:   ${recordJson(url, r).take(600)}")
    }
  }

  edgeByteDocs.foreach { case (name, _) =>
    test(s"edge doc '$name': extracted text and record are byte-identical to fixture") {
      val (url, r) = computeEdge(name)
      val expText = Files.readAllBytes(dir.resolve(s"edge_$name.txt"))
      assert(r.extractedText.getBytes(UTF_8).sameElements(expText),
        s"edge text drift on $name:\n--- expected\n${new String(expText, UTF_8).take(300)}\n--- actual\n${r.extractedText.take(300)}")
      val expJson = Files.readAllBytes(dir.resolve(s"edge_$name.json"))
      assert(recordJson(url, r).getBytes(UTF_8).sameElements(expJson),
        s"edge record drift on $name")
    }
  }
}
