package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines (builder brief):
  * media payloads as opaque `binary` columns with typed metadata, plus
  * decode / feature-extract / resize / frame-sample stages.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape, the
  * narrow `mapPartitions` stage boundaries — is real and tested; the
  * actual codec calls are STUBBED with a deterministic fake decoder
  * (`FakeCodec`), clearly marked, because no image/audio library ships in
  * this environment. Swapping `FakeCodec` for a real JNI/Java codec
  * changes no plan shape.
  *
  * Scale design (100 TB of media):
  *  - Binary payloads stay opaque until the latest possible stage; all
  *    filtering/joining happens on the (tiny) metadata columns first, so
  *    predicate pushdown and column pruning keep un-decoded bytes out of
  *    shuffles entirely.
  *  - Decode/feature stages are `mapPartitions` over the already-pruned
  *    rows: one codec init per partition (not per row), streaming
  *    iterator in/out — the Scala analogue of a batched `mapInPandas`.
  *  - Frame sampling explodes to (asset, frame_no) rows *before* decode,
  *    so each task decodes only the frames it owns — the unit of
  *    parallelism is the frame, not the video.
  */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  case class MediaMeta(width: Int, height: Int, format: String,
      durationMs: Long)

  case class MediaAsset(asset_id: Long, kind: String, meta: MediaMeta,
      payload: Array[Byte])

  case class MediaFeatures(asset_id: Long, kind: String, n_bytes: Int,
      mean_byte: Double, entropy_bucket: Int)

  case class Frame(asset_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("durationMs", LongType, nullable = false))),
      nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** STUB codec — deterministic fake standing in for a real decoder.
    * Replace `decode`/`resize` bodies with a real codec (e.g. via JNI)
    * without touching any pipeline code. */
  object FakeCodec {
    /** "Decode" = identity over bytes (a real impl returns pixel rows). */
    def decode(payload: Array[Byte]): Array[Byte] = payload

    /** "Resize" keeps every k-th byte — stands in for a downscale. */
    def resize(decoded: Array[Byte], factor: Int): Array[Byte] =
      decoded.indices.collect {
        case i if i % factor == 0 => decoded(i)
      }.toArray

    /** "Frame extract" = fixed-size slices of the payload. */
    def frame(payload: Array[Byte], frameNo: Int, frameSize: Int)
    : Array[Byte] = {
      val from = (frameNo.toLong * frameSize).toInt
      payload.slice(from, math.min(from + frameSize, payload.length))
    }
  }

  /** Build a deterministic media-asset table from the documents fixture
    * (text bytes as the opaque payload) — the harness for the plumbing. */
  def syntheticAssets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio"
          else "video"
        MediaAsset(id, kind,
          MediaMeta((nChars % 640).toInt + 64, (nChars % 480).toInt + 48,
            kind match {
              case "image" => "png"; case "audio" => "wav"; case _ => "mp4"
            },
            nChars * 10),
          text.getBytes("UTF-8"))
      }
  }

  /** Feature extraction: one codec init per PARTITION, streaming over
    * rows — the mapPartitions shape a real decoder needs. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // codec/session init would happen here, once per partition
      it.map { a =>
        val d = FakeCodec.decode(a.payload)
        val mean =
          if (d.isEmpty) 0.0
          else d.map(_.toInt & 0xff).sum.toDouble / d.length
        MediaFeatures(a.asset_id, a.kind, d.length, mean,
          (mean / 32).toInt)
      }
    }
  }

  /** Resize stage — narrow, payload-in/payload-out. */
  def resized(assets: Dataset[MediaAsset], factor: Int)
  : Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(a => a.copy(
      payload = FakeCodec.resize(FakeCodec.decode(a.payload), factor))))
  }

  /** Frame sampling: explode to (asset, frame_no) BEFORE decode so the
    * parallelism unit is the frame; each task decodes only its frames. */
  def sampleFrames(assets: Dataset[MediaAsset], everyNth: Int,
      frameSize: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    val withFrames = assets.toDF()
      .filter(col("kind") === "video")
      .withColumn("n_frames",
        ceil(length(col("payload")) / lit(frameSize)).cast("int"))
      .withColumn("frame_no",
        explode(expr(s"sequence(0, greatest(n_frames - 1, 0), $everyNth)")))
      .select(col("asset_id"), col("frame_no"), col("payload"))
    withFrames.as[(Long, Int, Array[Byte])]
      .mapPartitions(_.map { case (id, fno, payload) =>
        Frame(id, fno, FakeCodec.frame(payload, fno, frameSize))
      })
  }

  /** Metadata-first filtering: prune on metadata columns, never touching
    * payload bytes — verify with .explain that payload is absent from
    * the scan when only metadata is selected. */
  def metadataStats(assets: Dataset[MediaAsset]): DataFrame =
    assets.toDF()
      .groupBy(col("kind"), col("meta.format").as("format"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("meta.durationMs")).as("total_duration_ms"),
        avg(col("meta.width")).as("avg_width"))
      .orderBy(asc("kind"), asc("format"))

  /** The metadata-only aggregation as a driver-checked query: the asset
    * synthesis is a deterministic function of the documents fixture, so
    * DuckDB reproduces it in plain SQL — the codec stays out of the
    * plan entirely (the point of metadata-first design: per-format
    * inventory stats at 100 TB read tiny metadata columns, never a
    * payload byte). */
  val queries: Map[String, graft.Ql.Q] = Map(
    "multimodal_meta_stats" -> ((s, dir) =>
      metadataStats(syntheticAssets(s, dir))))

  val oracleSql: Map[String, String] = Map(
    "multimodal_meta_stats" ->
      """SELECT kind, format, count(*) AS n_assets,
        |  CAST(sum(duration_ms) AS BIGINT) AS total_duration_ms,
        |  avg(width) AS avg_width
        |FROM (
        |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
        |              WHEN doc_id % 3 = 1 THEN 'audio'
        |              ELSE 'video' END AS kind,
        |         CASE WHEN doc_id % 3 = 0 THEN 'png'
        |              WHEN doc_id % 3 = 1 THEN 'wav'
        |              ELSE 'mp4' END AS format,
        |         CAST(n_chars % 640 + 64 AS INT) AS width,
        |         n_chars * 10 AS duration_ms
        |  FROM documents)
        |GROUP BY kind, format
        |ORDER BY kind, format""".stripMargin)
}
