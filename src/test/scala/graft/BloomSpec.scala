package graft

import org.apache.spark.sql.functions._

/** Bloom membership sketch (graft.functions.BloomAggregates): the
  * guarantees the Scaladoc states, pinned — no false negatives ever
  * (the property file pruning is built on), a bounded false-positive
  * rate at the declared geometry, and determinism under
  * re-partitioning (OR-merge commutes). */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.BloomFunctions.register(spark)

  private lazy val terms = Tables.load(spark, sfDir, "documents")
    .selectExpr("explode(split(text, ' ')) AS term")

  test("no false negatives: every inserted term probes true") {
    val sk = terms.agg(expr("graft_bloom_sketch(term, 50000, 2)").as("sk"))
    val missed = terms.distinct()
      .crossJoin(broadcast(sk))
      .filter(!expr("graft_bloom_contains(sk, term)"))
      .count()
    assert(missed == 0L, s"$missed inserted terms probed false")
  }

  test("false-positive rate is bounded near the declared geometry") {
    val sk = terms.agg(expr("graft_bloom_sketch(term, 50000, 2)").as("sk"))
    // probe values that were NEVER inserted (a disjoint namespace)
    val absent = (1 to 20000).map(i => s"__absent_$i").toDF("term")
    val fps = absent.crossJoin(broadcast(sk))
      .filter(expr("graft_bloom_contains(sk, term)"))
      .count()
    // declared 2% at 50k expected items; the fixture vocabulary is far
    // smaller, so the realized rate must sit well under the target —
    // 4% is a generous ceiling that still catches a broken geometry
    assert(fps <= 20000 * 0.04,
      s"$fps of 20000 absent probes hit (expected ~<2%)")
  }

  test("deterministic under re-partitioning: OR-merge order cannot " +
      "change the filter") {
    def sketch(parts: Int): Array[Byte] =
      terms.repartition(parts)
        .agg(expr("graft_bloom_sketch(term, 50000, 2)").as("sk"))
        .collect()(0).getAs[Array[Byte]](0)
    val a = sketch(3)
    val b = sketch(17)
    assert(java.util.Arrays.equals(a, b),
      "bloom bytes must be partition-invariant")
  }

  test("typed probes agree with the driver-side JVM probe used for " +
      "manifest pruning") {
    val ids = (1L to 1000L).toDF("id")
    val sk = ids.agg(expr("graft_bloom_sketch(id, 50000, 2)").as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    (1L to 1000L).foreach { v =>
      assert(graft.functions.Bloom.mightContainJvm(
        sk, v, org.apache.spark.sql.types.LongType),
        s"driver probe missed inserted id $v")
    }
    val absentHits = (100001L to 110000L).count(v =>
      graft.functions.Bloom.mightContainJvm(
        sk, v, org.apache.spark.sql.types.LongType))
    assert(absentHits <= 400, s"$absentHits of 10000 absent ids hit")
  }
}
