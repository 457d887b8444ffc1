package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling main for the optimization round (not part of the
  * driver contract; deleted or kept as a scratch tool).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.mkSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    (0 until 3).foreach { rep =>
      val cents = time(s"train rep$rep") {
        graft.pipeline.Ivf.train(e, c = 16, iters = 2)
      }
      val vecs = e.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"))
      time(s"  assign-only rep$rep") {
        graft.pipeline.Ivf.assign(vecs, cents).count()
      }
      time(s"  vecs-scan rep$rep") { vecs.count() }
      time(s"  explode-agg rep$rep") {
        vecs.select(posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy(col("pos")).agg(avg(col("x"))).count()
      }
      time(s"search rep$rep") {
        graft.pipeline.Ivf.search(e, cents, col("vec_id") < 5, k = 5, nProbe = 4).count()
      }
    }
    spark.stop()
  }
}
