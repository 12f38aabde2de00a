package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up fixture generator (dev tooling, not part of the query
  * surface): replicates the driver fixtures N× into a new directory so
  * scaling behavior can be MEASURED instead of asserted in comments —
  * see SCALING.md for the recorded runs.
  *
  * Replication is one `crossJoin(range(copies))` pass per table (a
  * single scan fanning out N×, not N unions), with per-replica key
  * shifts chosen so the result is a CONSISTENT database, not N broken
  * ones: every foreign key moves by the same offset as its referenced
  * primary key (custkey/orderkey/partkey/suppkey), while the fixed dims
  * (nation, region) keep their cardinality — 10× customers over the
  * same 25 nations, exactly how a real corpus grows.
  *
  * Content tables are replicated as DISJOINT shards, preserving
  * workload character instead of degenerating it:
  *  - documents: every token gets a replica suffix, so within-replica
  *    near-dup structure is preserved EXACTLY while cross-replica
  *    Jaccard is 0 — near-dup pair counts scale linearly (verbatim text
  *    copies would make them quadratic: each doc would gain N-1 exact
  *    twins and the LSH output would measure the duplication artifact,
  *    not the operator).
  *  - embeddings: per-replica deterministic sign flips (dimension j
  *    negated iff bit (j mod 4) of the replica id is set). Cosine is
  *    invariant under a sign pattern applied to BOTH vectors, so
  *    within-replica similarity is bit-preserved, while cross-replica
  *    cosines scatter toward 0.
  *
  * Usage: runMain graft.tools.ScaleGen [srcDir] [dstDir] [copies]
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf10x")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // key offsets: one fixed stride per key family, far above any
    // fixture's key range (asserted), so replica i's keys are
    // key + i*stride and references stay consistent across tables
    val CK = 1000000L // custkey
    val OK = 10000000L // orderkey
    val PK = 1000000L // partkey
    val SK = 100000L // suppkey
    val DK = 1000000L // doc_id
    val VK = 1000000L // vec_id

    def load(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    def checkStride(df: DataFrame, key: String, stride: Long): Unit = {
      val mx = df.agg(max(col(key))).head.getLong(0)
      require(mx < stride, s"$key max $mx >= stride $stride")
    }

    /** One scan → N shifted replicas. `shifts` maps column → stride. */
    def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame = {
      val repl = df.crossJoin(
        spark.range(copies.toLong).toDF("rep"))
      shifts.foldLeft(repl) { case (d, (c, stride)) =>
        d.withColumn(c, col(c) + col("rep") * stride)
      }
    }

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scalegen] wrote $name")
    }

    // fixed dims: single copy
    write(load("region"), "region")
    write(load("nation"), "nation")

    val customer = load("customer")
    checkStride(customer, "c_custkey", CK)
    write(replicate(customer, Map("c_custkey" -> CK)).drop("rep"),
      "customer")

    val orders = load("orders")
    checkStride(orders, "o_orderkey", OK)
    write(replicate(orders,
      Map("o_orderkey" -> OK, "o_custkey" -> CK)).drop("rep"), "orders")

    val part = load("part")
    checkStride(part, "p_partkey", PK)
    write(replicate(part, Map("p_partkey" -> PK)).drop("rep"), "part")

    val supplier = load("supplier")
    checkStride(supplier, "s_suppkey", SK)
    write(replicate(supplier, Map("s_suppkey" -> SK)).drop("rep"),
      "supplier")

    val lineitem = load("lineitem")
    write(replicate(lineitem,
      Map("l_orderkey" -> OK, "l_partkey" -> PK, "l_suppkey" -> SK))
      .drop("rep"), "lineitem")

    // documents: disjoint-shard text (token suffix per replica)
    val documents = load("documents")
    checkStride(documents, "doc_id", DK)
    write(replicate(documents, Map("doc_id" -> DK))
      .withColumn("text",
        expr("concat_ws(' ', transform(split(text, ' '), " +
          "t -> concat(t, '_', CAST(rep AS STRING))))"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("rep"), "documents")

    // embeddings: per-replica sign pattern (cosine-preserving within)
    val embeddings = load("embeddings")
    checkStride(embeddings, "vec_id", VK)
    write(replicate(embeddings, Map("vec_id" -> VK))
      .withColumn("embedding",
        expr("transform(embedding, (x, j) -> CAST(x * CASE WHEN " +
          "((CAST(rep AS INT) >> (j % 4)) & 1) = 1 THEN -1.0 ELSE 1.0 " +
          "END AS FLOAT))"))
      .drop("rep"), "embeddings")

    // events: replicate like the relational tables so the full-suite
    // scaling run exercises the events_* queries at N×. The fixture's
    // TIMESTAMP(NANOS) column is read as raw int64 epoch-nanos
    // (nanosAsLong — the same path Tables.load uses) and written back as
    // plain int64; Tables.load's `timestamp_micros(ts DIV 1000)`
    // conversion is identical for both physical encodings. event_id and
    // user_id shift per replica (N× distinct users with per-user
    // behavior preserved — sessionization/retention/top-k structure is
    // replica-local, exactly how a user base grows); ts/type/value/props
    // stay untouched so the hourly/window distributions scale ×N in
    // density, not in span.
    val EK = 1000000L // event_id
    val UK = 100000L // user_id
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = load("events")
    checkStride(events, "event_id", EK)
    checkStride(events, "user_id", UK)
    write(replicate(events, Map("event_id" -> EK, "user_id" -> UK))
      .drop("rep"), "events")
    println(s"[scalegen] done: $dst (${copies}x $src)")
    spark.stop()
  }
}
