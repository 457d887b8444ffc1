package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.SparkSession

/** Property gate for the dedup backbone: on random graphs,
  * `Dedup.connectedComponents` (distributed fixpoint min-label
  * propagation) must equal a local union-find ground truth.
  */
class DedupPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("dedup-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Local ground truth: union-find with min-id canonical labels. */
  private def unionFind(n: Int, edges: Seq[(Int, Int)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the min representative
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("connectedComponents equals union-find on random graphs (20 seeds)") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(2, 24)
      m <- Gen.choose(0, 30)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
    } yield (n, es.filter(e => e._1 != e._2))

    (0 until 20).foreach { k =>
      val (n, es) = gen.apply(Gen.Parameters.default, Seed(k.toLong)).get
      val vertices = (0 until n).map(_.toLong).toDF("id")
      val sym = es.flatMap(e => Seq((e._1.toLong, e._2.toLong), (e._2.toLong, e._1.toLong)))
      val edges = if (sym.isEmpty) Seq.empty[(Long, Long)].toDF("src", "dst")
                  else sym.toDF("src", "dst")
      val got = Dedup.connectedComponents(vertices, edges)
        .as[(Long, Long)].collect().toMap
      val want = unionFind(n, es)
      assert(got == want, s"seed $k: n=$n edges=$es\n got=$got\nwant=$want")
    }
  }
}
