package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType}

/** Domain-blocklist semantics ([[UrlBlocklist]]): DNS-suffix coverage on
  * label boundaries, most-specific rule wins, `allow` whitelists its
  * subtree, subdomain-only rules never block their parent.
  */
class UrlBlocklistSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import scala.jdk.CollectionConverters._

  private def df(rows: Seq[Row], fields: (String, org.apache.spark.sql.types.DataType)*) =
    spark.createDataFrame(rows.asJava, org.apache.spark.sql.types.StructType(
      fields.map(f => org.apache.spark.sql.types.StructField(f._1, f._2)).toSeq))

  private val rules = Seq(
    Row("dom.com", "ads"),
    Row("ok.dom.com", "allow"),
    Row("bad.sub.org", "tracker"))

  private def verdicts(hosts: (Long, String)*): Map[Long, String] = {
    val h = df(hosts.map { case (id, host) => Row(id, host) },
      ("doc_id", LongType), ("host", StringType))
    val r = df(rules, ("pattern", StringType), ("category", StringType))
    UrlBlocklist.decisions(h, r).collect()
      .map(row => row.getAs[Long]("doc_id") -> row.getAs[String]("category")).toMap
  }

  test("a rule covers its domain and every subdomain under it") {
    assert(verdicts(1L -> "dom.com", 2L -> "a.dom.com", 3L -> "deep.a.dom.com")
      == Map(1L -> "ads", 2L -> "ads", 3L -> "ads"))
  }

  test("the most specific rule wins: an allow exception re-admits its subtree") {
    assert(verdicts(1L -> "ok.dom.com", 2L -> "x.ok.dom.com", 3L -> "other.dom.com")
      == Map(1L -> "allowed", 2L -> "allowed", 3L -> "ads"))
  }

  test("a subdomain-only rule never blocks its parent; unlisted hosts pass") {
    assert(verdicts(1L -> "bad.sub.org", 2L -> "sub.org", 3L -> "unlisted.net")
      == Map(1L -> "tracker", 2L -> "allowed", 3L -> "allowed"))
  }

  test("suffix matching respects label boundaries: notdom.com is not dom.com") {
    assert(verdicts(1L -> "notdom.com") == Map(1L -> "allowed"))
  }
}
