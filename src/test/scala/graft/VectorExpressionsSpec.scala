package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Similarity

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_cosine matches hand-computed values incl. nulls and zeros") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Array(1.0, 0.0), Array(1.0, 0.0)),   // identical -> 1
      (Array(1.0, 0.0), Array(0.0, 1.0)),   // orthogonal -> 0
      (Array(1.0, 0.0), Array(-1.0, 0.0)),  // opposite -> -1
      (Array(3.0, 4.0), Array(3.0, 4.0)))
      .toDF("a", "b")
      .selectExpr("graft_cosine(a, b) AS c", "graft_dot(a, b) AS d")
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(rows(1).getDouble(0)) < 1e-12)
    assert(math.abs(rows(2).getDouble(0) + 1.0) < 1e-12)
    assert(math.abs(rows(3).getDouble(1) - 25.0) < 1e-12)
    // zero vector -> null, not NaN
    val z = Seq((Array(0.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
      .selectExpr("graft_cosine(a, b) AS c").collect()(0)
    assert(z.isNullAt(0))
  }

  test("native expression participates in whole-stage codegen") {
    VectorFunctions.register(spark)
    // must be a non-local source: a local Seq is constant-folded into a
    // LocalTableScan before any codegen happens
    val df = Tables.load(spark, sfDir, "embeddings")
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .selectExpr("graft_cosine(v, v) AS c")
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen
    // stage; note the higher-order `transform` projection is NOT fused
    // (no `*`) while the graft_cosine projection is — which is the point
    // of having the native expression.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("graft_cosine")), s"plan:\n$plan")
    val self = df.collect()
    assert(self.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("native knn agrees exactly with higher-order-function knn") {
    val hof = Similarity.queries("knn_bruteforce")(spark, sfDir)
      .select("q_id", "rk", "c_id", "cos_r")
      .as[(Long, Int, Long, Double)].collect().toSeq
    val native = Similarity.queries("knn_bruteforce_native")(spark, sfDir)
      .select("q_id", "rk", "c_id", "cos_r")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(hof == native)
  }

  test("graft_rotate ≡ HOF matmul; identity fixed point; shape/null -> NULL") {
    VectorFunctions.register(spark)
    // deterministic pseudo-random vectors + rotation-shaped matrix
    val vecs = (0 until 20).map(i =>
      Tuple1(Array.tabulate(8)(j => math.sin(i * 8 + j + 1))))
      .toDF("v")
    val rot = Seq.tabulate(8, 8)((i, j) => math.cos(i * 8 + j + 1) / 3.0)
    val rdf = Seq(Tuple1(rot.map(_.toSeq))).toDF("rot")
    val both = vecs.crossJoin(broadcast(rdf)).selectExpr(
      "graft_rotate(v, rot) AS fast",
      """transform(sequence(0, size(v) - 1), j ->
        |  aggregate(sequence(0, size(v) - 1), CAST(0 AS DOUBLE),
        |    (acc, i) -> acc + v[i] * rot[i][j])) AS slow""".stripMargin)
      .as[(Seq[Double], Seq[Double])].collect()
    both.foreach { case (fast, slow) =>
      assert(fast.size == slow.size)
      fast.zip(slow).foreach { case (f, g) =>
        // identical loop order => bit-identical accumulation
        assert(f == g, s"fast=$f slow=$g")
      }
    }
    // identity rotation is a fixed point
    val id = Seq.tabulate(8, 8)((i, j) => if (i == j) 1.0 else 0.0)
    val idDf = Seq(Tuple1(id.map(_.toSeq))).toDF("rot")
    vecs.crossJoin(broadcast(idDf))
      .selectExpr("v", "graft_rotate(v, rot) AS r")
      .as[(Seq[Double], Seq[Double])].collect()
      .foreach { case (v, r) => assert(v == r) }
    // shape mismatch (4x4 rot vs 8-dim vec) -> NULL, not a truncated rotate
    val small = Seq(Tuple1(Seq.tabulate(4, 4)((i, j) => 1.0)
      .map(_.toSeq))).toDF("rot")
    val bad = vecs.limit(1).crossJoin(broadcast(small))
      .selectExpr("graft_rotate(v, rot) AS r").collect()(0)
    assert(bad.isNullAt(0))
  }

  test("graft_shingles generator ≡ transform+explode; null yields no rows") {
    graft.functions.SketchFunctions.register(spark)
    val docs = Seq(
      (1L, "a b c d e"), (2L, "x y"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val gen = docs.selectExpr("id", "graft_shingles(text, 3)")
      .as[(Long, String)].collect().toSeq.sorted
    val hof = docs.filter(col("text").isNotNull).selectExpr("id",
      """explode(CASE WHEN size(split(text, ' ')) < 3
        |  THEN array(text)
        |  ELSE transform(sequence(0, size(split(text, ' '))-3), i ->
        |    concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1],
        |      split(text, ' ')[i+2])) END) AS shingle""".stripMargin)
      .as[(Long, String)].collect().toSeq.sorted
    assert(gen == hof)
    assert(gen.count(_._1 == 1L) == 3) // 5 tokens -> 3 trigram rows
    assert(gen.count(_._1 == 2L) == 1) // short doc -> whole text
    assert(!gen.exists(_._1 == 3L)) // null text generates nothing
  }
}
