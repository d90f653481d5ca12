package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSession._

  private lazy val media = Multimodal.synthMedia(spark, 60, partitions = 4)

  test("media table has binary payloads and typed metadata") {
    val rows = media.collect()
    assert(rows.length == 60)
    assert(rows.map(_.kind).toSet == Set("image", "audio", "video"))
    rows.foreach { m =>
      assert(m.data.nonEmpty)
      if (m.kind == "image") assert(m.meta.width > 0 && m.meta.height > 0)
      if (m.kind == "audio") assert(m.meta.durationMs > 0)
    }
  }

  test("decode emits 1 frame per image, n per video, none for audio") {
    val frames = Multimodal.decode(media, framesPerVideo = 3).collect()
    val byId = frames.groupBy(_.media_id)
    media.collect().foreach { m =>
      val n = byId.get(m.media_id).map(_.length).getOrElse(0)
      m.kind match {
        case "image" => assert(n == 1)
        case "video" => assert(n == 3)
        case _       => assert(n == 0)
      }
    }
    frames.foreach(f => assert(f.pixels.length == f.width * f.height))
  }

  test("decode is deterministic") {
    val a = Multimodal.decode(media).collect().sortBy(f => (f.media_id, f.frame_idx))
    val b = Multimodal.decode(media).collect().sortBy(f => (f.media_id, f.frame_idx))
    a.zip(b).foreach { case (x, y) => assert(x.pixels.sameElements(y.pixels)) }
  }

  test("resize produces the target shape, partition-locally") {
    val frames = Multimodal.decode(media)
    val resized = Multimodal.resize(frames, 8, 8)
    // no shuffle: resize must preserve the decode partitioning
    assert(resized.rdd.getNumPartitions == frames.rdd.getNumPartitions)
    resized.collect().foreach(f => assert(f.width == 8 && f.height == 8 && f.pixels.length == 64))
  }

  test("feature extraction yields fixed-dim float embeddings") {
    val feats = Multimodal.features(Multimodal.resize(Multimodal.decode(media), 8, 8))
    val rows = feats.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[scala.collection.Seq[Float]]("embedding").length == 16))
  }

  test("media features compose with the ANN similarity stack") {
    import graft.operators.Similarity
    val feats = Multimodal.features(Multimodal.resize(Multimodal.decode(media), 8, 8))
      .filter(col("frame_idx") === 0)
      .select(col("media_id").as("vec_id"), col("embedding"))
    val topk = Similarity.annTopK(feats, nQueries = 3, k = 3).collect()
    assert(topk.nonEmpty)
    topk.foreach { r =>
      val c = r.getAs[Double]("cos")
      assert(!c.isNaN && c >= -1.0001 && c <= 1.0001, s"cosine $c out of range")
    }
  }
}
