package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets = Multimodal.syntheticAssets(spark, sfDir)

  test("synthetic assets: binary payload + typed metadata for every doc") {
    val n = assets.count()
    assert(n == Tables.load(spark, sfDir, "documents").count())
    val kinds = assets.map(_.kind).distinct().collect().toSet
    assert(kinds == Set("image", "audio", "video"))
    assert(assets.collect().forall(_.payload.nonEmpty))
  }

  test("feature extraction runs per-partition and is deterministic") {
    val f1 = Multimodal.extractFeatures(assets).collect()
      .sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(assets).collect()
      .sortBy(_.asset_id)
    assert(f1.length == assets.count())
    assert(f1.map(f => (f.asset_id, f.n_bytes, f.mean_byte)).toSeq ==
      f2.map(f => (f.asset_id, f.n_bytes, f.mean_byte)).toSeq)
    // payload is ascii text => mean byte in printable range
    assert(f1.forall(f => f.mean_byte > 32 && f.mean_byte < 127))
  }

  test("resize shrinks payloads by the factor") {
    val before = assets.collect().map(a => a.asset_id -> a.payload.length)
      .toMap
    Multimodal.resized(assets, 4).collect().foreach { a =>
      val expect = (before(a.asset_id) + 3) / 4
      assert(a.payload.length == expect,
        s"asset ${a.asset_id}: ${a.payload.length} != $expect")
    }
  }

  test("frame sampling yields every-nth frame per video asset") {
    val frames = Multimodal.sampleFrames(assets, everyNth = 2,
      frameSize = 64).collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.asset_id).values.foreach { grp =>
      val nos = grp.map(_.frame_no).sorted
      assert(nos.head == 0)
      assert(nos.forall(_ % 2 == 0))
    }
    assert(frames.forall(_.frame_bytes.length <= 64))
  }

  test("metadata stats never scan the payload column (column pruning)") {
    val stats = Multimodal.metadataStats(assets)
    assert(stats.count() > 0)
    val plan = stats.queryExecution.optimizedPlan.toString
    assert(!plan.contains("payload"),
      s"payload column not pruned from metadata-only query:\n$plan")
  }
}
