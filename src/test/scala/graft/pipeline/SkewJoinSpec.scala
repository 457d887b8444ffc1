package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** AQE skew-join: the RUNTIME complement to `SkewTools`' manual salting.
  * A hot key that would stall one sort-merge task gets its shuffle
  * partition split by `OptimizeSkewedJoin` at runtime (the dim side is
  * replicated per split) — no code change, no salt column. At 100 TB
  * this is the first line of defense for join skew; salting remains for
  * aggregations (where AQE cannot split) and for engines without AQE.
  */
class SkewJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("skewjoin-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // make the tiny test corpus register as skewed: a partition is skewed
    // when > factor × median AND > threshold; advisory size is the split
    // granularity
    .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // forbid broadcast so the join is a shuffled SMJ (the skewable shape)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("OptimizeSkewedJoin splits the hot key's partition at runtime (skew=true in the final plan)") {
    import spark.implicits._
    // 100k facts: 95% on key 0 (one shuffle partition ≫ median), payload
    // padding makes the hot partition exceed the skew threshold
    val fact = spark.range(0, 100000).select(
      when($"id" % 20 =!= 0, lit(0L)).otherwise($"id" % 97).as("k"),
      concat(lit("payload-"), $"id", lit("-"), lit("x" * 64)).as("v"))
    val dim = spark.range(0, 97).select($"id".as("k"), concat(lit("dim-"), $"id").as("d"))

    val joined = fact.join(dim, "k")
    val n = joined.count()
    assert(n == 100000L, "inner join on a complete dim keeps every fact row")

    // re-run as a collect-less action to freeze the final adaptive plan,
    // then read it: the skewed SMJ must be marked and split
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"expected a finalized AQE plan:\n$plan")
    assert(plan.contains("skew=true"),
      s"OptimizeSkewedJoin did not fire — no skew=true in:\n$plan")

    // correctness under the split: per-key counts identical to a
    // skew-join-disabled run
    val expected = spark.range(0, 100000).select(
      when($"id" % 20 =!= 0, lit(0L)).otherwise($"id" % 97).as("k"))
      .groupBy("k").count().as[(Long, Long)].collect().toMap
    val got = joined.groupBy("k").count().as[(Long, Long)].collect().toMap
    assert(got == expected)
  }
}
