package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration of the graft native functions — the
  * deployment path for clusters: either
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * The runtime alternative (`VectorFunctions.register` /
  * `SketchFunctions.register`) mutates an existing session's registry
  * and is what the per-query entry points use; this class makes the
  * functions available to every session of the application, including
  * pure-SQL users. Exercised end-to-end by `graft.Smoke` (fresh JVM,
  * fresh session built with these extensions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, usage: String,
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name, usage),
      builder)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(fn("graft_cosine",
      "graft_cosine(a, b) - cosine similarity of two ARRAY<DOUBLE>",
      exprs => CosineSim(exprs(0), exprs(1))))
    e.injectFunction(fn("graft_dot",
      "graft_dot(a, b) - dot product of two ARRAY<DOUBLE>",
      exprs => DotProduct(exprs(0), exprs(1))))
    e.injectFunction(fn("graft_minhash",
      "graft_minhash(tokens, perms, ngram) - MinHash signature",
      exprs => TokenMinHash(exprs(0),
        SketchFunctions.intLitArg(exprs(1), "perms"),
        SketchFunctions.intLitArg(exprs(2), "ngram"))))
    e.injectFunction(fn("graft_simhash",
      "graft_simhash(tokens) - 64-bit SimHash",
      exprs => SimHash64(exprs(0))))
    e.injectFunction(fn("graft_hplsh",
      "graft_hplsh(v, tables, bits) - hyperplane LSH bucket ids",
      exprs => HyperplaneLsh(exprs(0),
        SketchFunctions.intLitArg(exprs(1), "tables"),
        SketchFunctions.intLitArg(exprs(2), "bits"))))
    e.injectFunction(fn("graft_jaccard",
      "graft_jaccard(a, b) - exact token-set Jaccard, no temp arrays",
      exprs => JaccardSim(exprs(0), exprs(1))))
    e.injectFunction(fn("graft_jaccard_sorted",
      "graft_jaccard_sorted(a, b) - Jaccard over sorted ARRAY<BIGINT>",
      exprs => JaccardSortedLong(exprs(0), exprs(1))))
    e.injectFunction(fn("graft_bpe_count",
      "graft_bpe_count(text, chunkLen) - BPE-ish subword chunk count",
      exprs => BpeChunkCount(exprs(0),
        SketchFunctions.intLitArg(exprs(1), "chunkLen"))))
    val prec = HllFunctions.precisionOf _
    e.injectFunction(fn("graft_hll",
      "graft_hll(col[, p]) - HyperLogLog distinct estimate",
      exprs => HllCardinality(exprs.head, prec(exprs))))
    e.injectFunction(fn("graft_hll_sketch",
      "graft_hll_sketch(col[, p]) - persistable HLL registers",
      exprs => HllSketchAgg(exprs.head, prec(exprs))))
    e.injectFunction(fn("graft_hll_union",
      "graft_hll_union(sketch[, p]) - estimate over unioned sketches",
      exprs => HllUnionAgg(exprs.head, prec(exprs),
        precisionExplicit = exprs.length >= 2)))
    e.injectFunction(fn("graft_topk",
      "graft_topk(col, k) - Misra-Gries heavy hitters",
      exprs => MisraGriesTopK(exprs.head,
        SketchFunctions.intLitArg(exprs(1), "k"))))
    e.injectFunction(fn("graft_cms_sketch",
      "graft_cms_sketch(col, depth, width) - Count-Min frequency sketch",
      exprs => CmsSketchAgg(exprs.head,
        SketchFunctions.intLitArg(exprs(1), "depth"),
        SketchFunctions.intLitArg(exprs(2), "width"))))
    e.injectFunction(fn("graft_cms_est",
      "graft_cms_est(sketch, item) - Count-Min point estimate",
      exprs => CmsEstimate(exprs(0), exprs(1))))
    e.injectFunction(fn("graft_bottomk",
      "graft_bottomk(col, k) - deterministic min-wise distinct sample",
      exprs => BottomKAgg(exprs.head,
        SketchFunctions.intLitArg(exprs(1), "k"))))
    graft.plans.GraftRules.all.foreach(r => e.injectOptimizerRule(_ => r))
  }
}
