package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest neighbor — the scale path for
  * embedding search when no natural bucket column (q35's label) exists:
  * centroids are trained on the corpus, every vector is assigned to its
  * nearest centroid (the "inverted list"), and a query probes only the
  * few nearest lists instead of scanning the corpus.
  *
  * Everything is DataFrame ops on `array<double>` with higher-order
  * functions — no UDFs, no driver-side vectors except the tiny broadcast
  * centroid table (C rows), which is exactly how IVF deploys at scale:
  * lists are the shuffle/partition key; the centroid table is a broadcast
  * dimension. Deterministic by construction (seed centroids = first C
  * vectors, fixed Lloyd iteration count) so tests can pin recall.
  */
object Ivf {

  private def dist2(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (x,y) -> (x-y)*(x-y)), 0D, (acc,v) -> acc + v)")

  /** One Lloyd refinement step implemented relationally: assign to the
    * nearest current centroid, then per-cluster element-wise mean via
    * posexplode → groupBy(cluster, pos) → re-assemble ordered arrays.
    */
  private def lloydStep(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val assigned = assign(vecs, centroids)
    assigned
      .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cluster"), col("pos")).agg(avg(col("x")).as("m"))
      .groupBy(col("cluster"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("cv"))
  }

  /** Nearest-centroid assignment: broadcast the C-row centroid table,
    * argmin by distance (min_by keeps it one aggregate, no window).
    */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .withColumn("d2", dist2("v", "cv"))
      .groupBy(col("vec_id"))
      .agg(expr("min_by(cluster, struct(d2, cluster))").as("cluster"),
        first(col("v")).as("v"))

  /** Train: seed centroids are the first `c` vectors by id (deterministic —
    * on a production corpus this is the offline k-means|| job), refined by
    * `iters` Lloyd steps. Returns (cluster, cv).
    *
    * @param reliable truncate per-iteration lineage with reliable
    *                 `checkpoint()` (needs `setCheckpointDir`; survives
    *                 executor loss on a real cluster) instead of
    *                 executor-local `localCheckpoint` — same trade-off as
    *                 [[Dedup.connectedComponents]].
    */
  def train(emb: DataFrame, c: Int = 16, iters: Int = 2,
      reliable: Boolean = false): DataFrame = {
    def cp(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(true)
    val vecs = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"))
    var centroids = cp(vecs.filter(col("vec_id") < c)
      .select(col("vec_id").cast("int").as("cluster"), col("v").as("cv")))
    (0 until iters).foreach { _ =>
      centroids = cp(lloydStep(vecs, centroids))
    }
    centroids
  }

  /** Probe: top-k cosine neighbors for each query, scanning only the
    * `nProbe` inverted lists whose centroids are nearest the query.
    */
  def search(emb: DataFrame, centroids: DataFrame,
      queryPred: org.apache.spark.sql.Column, k: Int = 5, nProbe: Int = 4): DataFrame = {
    val vecs = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"))
    val lists = assign(vecs, centroids) // (vec_id, cluster, v)

    val queries = vecs.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    // probe list per query: nProbe nearest centroids (C rows broadcast)
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("qd2").asc, col("cluster").asc)
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("qd2", dist2("qv", "cv"))
      .withColumn("prk", row_number().over(probeW))
      .filter(col("prk") <= nProbe)
      .select(col("query_id"), col("qv"), col("cluster"))

    // candidate generation is a hash join on the list id — the corpus is
    // never cross-joined
    val pairs = probes.join(lists, Seq("cluster"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(
        expr("aggregate(zip_with(qv, v, (a,b) -> a*b), 0D, (acc,x) -> acc + x)") /
          (expr("sqrt(aggregate(qv, 0D, (acc,x) -> acc + x*x))") *
            expr("sqrt(aggregate(v, 0D, (acc,x) -> acc + x*x))")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id").asc)
    pairs.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id").as("neighbor_id"), col("cos"))
  }
}
