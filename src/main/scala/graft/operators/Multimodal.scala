package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (SURVEY.md §2H):
  * media as opaque binary columns + typed metadata, with decode /
  * resize / frame-sample as per-partition pipeline stages.
  *
  * The Spark-side plumbing — schema, partitioning, per-partition
  * batching, stage composition — is real and tested. The CODEC IS A
  * DETERMINISTIC STUB (this container ships no image/audio libs): the
  * "decoder" expands bytes by a pure function of the payload, so
  * swapping in a real codec changes only [[StubCodec]]. At scale each
  * stage is `mapPartitions` (no per-row JNI/process setup: a real
  * decoder would be initialized once per partition), media stays
  * binary end-to-end (never in driver memory), and partition counts
  * are controlled by the caller before the expensive stage.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, durationMs: Long, codec: String)
  case class MediaRow(media_id: Long, kind: String, data: Array[Byte], meta: MediaMeta)
  case class DecodedFrame(media_id: Long, frame_idx: Int, width: Int, height: Int,
                          pixels: Array[Byte])

  /** ==== STUB CODEC ==== deterministic fake decode: pixel (x,y) of
    * frame f is a pure function of (payload hash, f, x, y). A real
    * implementation would wrap libjpeg/ffmpeg here, initialized once
    * per partition in the mapPartitions below. */
  object StubCodec {
    def payloadHash(data: Array[Byte]): Long =
      data.foldLeft(1125899906842597L)((h, b) => h * 31L + (b & 0xff))
    def decodeFrame(data: Array[Byte], frameIdx: Int, w: Int, h: Int): Array[Byte] = {
      val base = payloadHash(data) ^ (frameIdx.toLong * 0x9e3779b97f4a7c15L)
      val px = new Array[Byte](w * h)
      var i = 0
      while (i < px.length) {
        px(i) = (graft.functions.TextHash.mix64(base ^ i) & 0xff).toByte
        i += 1
      }
      px
    }
  }

  /** Deterministic synthetic media table (the testdata ships no binary
    * media): payload bytes and metadata are pure functions of id. */
  def synthMedia(spark: SparkSession, n: Int, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 64 + (id % 191).toInt
      val data = Array.tabulate[Byte](len)(i =>
        (graft.functions.TextHash.mix64(id * 131L + i) & 0xff).toByte)
      val meta = kind match {
        case "image" => MediaMeta(32 + (id % 32).toInt, 24 + (id % 24).toInt, 0L, "stub-img")
        case "audio" => MediaMeta(0, 0, 1000L + (id % 9000), "stub-pcm")
        case _       => MediaMeta(16 + (id % 16).toInt, 16, 2000L + (id % 8000), "stub-vid")
      }
      MediaRow(id, kind, data, meta)
    }
  }

  /** Decode stage: one decoded frame per image, n sampled frames per
    * video (uniform by duration), none for audio. Per-partition
    * iteration — codec state would be reused across rows. */
  def decode(media: Dataset[MediaRow], framesPerVideo: Int = 3): Dataset[DecodedFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codec: init native decoder here, once per partition
      rows.flatMap { m =>
        m.kind match {
          case "image" =>
            Iterator.single(DecodedFrame(m.media_id, 0, m.meta.width, m.meta.height,
              StubCodec.decodeFrame(m.data, 0, m.meta.width, m.meta.height)))
          case "video" =>
            (0 until framesPerVideo).iterator.map { f =>
              DecodedFrame(m.media_id, f, m.meta.width, m.meta.height,
                StubCodec.decodeFrame(m.data, f, m.meta.width, m.meta.height))
            }
          case _ => Iterator.empty
        }
      }
    }
  }

  /** Resize stage: nearest-neighbour downsample of the stub pixel
    * buffer — pure per-row arithmetic, stays in the same partition
    * (no shuffle between decode and resize). */
  def resize(frames: Dataset[DecodedFrame], outW: Int, outH: Int): Dataset[DecodedFrame] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { rows =>
      rows.map { f =>
        val px = new Array[Byte](outW * outH)
        var y = 0
        while (y < outH) {
          var x = 0
          while (x < outW) {
            val sx = x * f.width / outW
            val sy = y * f.height / outH
            px(y * outW + x) = f.pixels(sy * f.width + sx)
            x += 1
          }
          y += 1
        }
        DecodedFrame(f.media_id, f.frame_idx, outW, outH, px)
      }
    }
  }

  /** Feature-extract stage: fixed-length embedding per frame (mean /
    * moments over pixel blocks) — the shape a downstream ANN index
    * consumes. */
  def features(frames: Dataset[DecodedFrame], dim: Int = 16): DataFrame = {
    import frames.sparkSession.implicits._
    frames.map { f =>
      val n = f.pixels.length
      // float elements: the ANN stack (Similarity via DotFD/RhpSig)
      // consumes array<float> — a double array would be read wrongly
      val vec = Array.tabulate(dim) { d =>
        var acc = 0.0; var i = d
        while (i < n) { acc += (f.pixels(i) & 0xff); i += dim }
        (acc / ((n + dim - 1 - d) / dim).max(1)).toFloat
      }
      (f.media_id, f.frame_idx, vec)
    }.toDF("media_id", "frame_idx", "embedding")
  }
}
