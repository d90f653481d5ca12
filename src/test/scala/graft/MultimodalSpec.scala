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

  test("PPM codec round-trips a known image exactly") {
    import Multimodal.Codec
    // 2x2 image: red, green, blue, white
    val rgb = Array[Byte](
      255.toByte, 0, 0,  0, 255.toByte, 0,
      0, 0, 255.toByte,  255.toByte, 255.toByte, 255.toByte)
    val (w, h, gray) = Codec.decodePpm(Codec.encodePpm(2, 2, rgb))
    assert(w == 2 && h == 2)
    // BT.601 integer luma: r->76 (299*255/1000), g->149, b->29, white->255
    assert(gray.map(_ & 0xff).toSeq == Seq(76, 149, 29, 255))
  }

  test("PPM header parse handles comments and whitespace") {
    import Multimodal.Codec
    val body = Array[Byte](10, 20, 30)
    val payload = "P6 # binary pixmap\n# a comment line\n1 1\n255\n".getBytes("US-ASCII") ++ body
    val (w, h, gray) = Codec.decodePpm(payload)
    assert(w == 1 && h == 1)
    assert((gray(0) & 0xff) == (299 * 10 + 587 * 20 + 114 * 30) / 1000)
  }

  test("PNG codec round-trips a known image exactly (javax.imageio)") {
    import Multimodal.Codec
    // same 2x2 image as the PPM test: PNG is lossless, so the decoded
    // luma must be bit-identical to the PPM path's
    val rgb = Array[Byte](
      255.toByte, 0, 0,  0, 255.toByte, 0,
      0, 0, 255.toByte,  255.toByte, 255.toByte, 255.toByte)
    val (w, h, gray) = Codec.decodeImage(Codec.encodePng(2, 2, rgb))
    assert(w == 2 && h == 2)
    assert(gray.map(_ & 0xff).toSeq == Seq(76, 149, 29, 255))
  }

  test("JPEG codec recovers luma within quantization tolerance") {
    import Multimodal.Codec
    // flat color blocks survive JPEG's DCT almost exactly; assert the
    // decoded luma stays within a tight tolerance of BT.601
    val (r, g, b) = (100, 150, 200)
    val rgb = Array.tabulate[Byte](16 * 16 * 3)(i =>
      (i % 3 match { case 0 => r; case 1 => g; case _ => b }).toByte)
    val expected = (299 * r + 587 * g + 114 * b) / 1000
    val (w, h, gray) = Codec.decodeImage(Codec.encodeJpeg(16, 16, rgb))
    assert(w == 16 && h == 16)
    gray.foreach(px => assert(math.abs((px & 0xff) - expected) <= 4,
      s"luma ${px & 0xff} deviates from $expected"))
  }

  test("decodeImage rejects foreign payloads with a clear error") {
    import Multimodal.Codec
    val wav = Codec.encodeWavPcm16(8000, Array.fill[Short](10)(5))
    intercept[IllegalArgumentException](Codec.decodeImage(wav))
  }

  test("synthetic PNG and JPEG rows flow through the real imageio decode path") {
    import Multimodal.Codec
    val compressed = media.collect().filter(m => Set("png", "jpeg")(m.meta.codec))
    assert(compressed.exists(_.meta.codec == "png"), "synthMedia must emit PNG rows")
    assert(compressed.exists(_.meta.codec == "jpeg"), "synthMedia must emit JPEG rows")
    val decoded = Multimodal.decode(media).collect().groupBy(_.media_id)
    compressed.foreach { m =>
      val f = decoded(m.media_id).head
      // the distributed decode equals a local imageio decode, and the
      // dims match the payload's own header (not just the metadata)
      val (w, h, gray) = Codec.decodeImage(m.data)
      assert(f.width == w && f.height == h && w == m.meta.width && h == m.meta.height)
      assert(f.pixels.sameElements(gray))
    }
  }

  test("Y4M codec round-trips grayscale frames exactly") {
    import Multimodal.Codec
    val frames = Seq.tabulate(4)(f => Array.tabulate[Byte](6)(i => (f * 10 + i).toByte))
    val (w, h, out) = Codec.decodeY4m(Codec.encodeY4m(3, 2, frames))
    assert(w == 3 && h == 2 && out.length == 4)
    frames.zip(out).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("GIF codec round-trips grayscale frames exactly (javax.imageio sequence)") {
    import Multimodal.Codec
    val frames = Seq.tabulate(4)(f =>
      Array.tabulate[Byte](64)(i => ((f * 40 + i * 3) & 0xff).toByte))
    val (w, h, out) = Codec.decodeGifFrames(Codec.encodeGif(8, 8, frames))
    assert(w == 8 && h == 8 && out.length == 4)
    // 256-gray palette: GIF is lossless for 8-bit grayscale
    frames.zip(out).foreach { case (a, b) => assert(a.sameElements(b)) }
    intercept[IllegalArgumentException](
      Codec.decodeGifFrames("GIF89a then garbage".getBytes("US-ASCII")))
    // tiny frames hit a JDK GIF-writer LZW bug — refused, not corrupted
    intercept[IllegalArgumentException](
      Codec.encodeGif(3, 2, Seq(Array.fill[Byte](6)(1))))
  }

  test("MJPEG-in-AVI codec round-trips flat frames within JPEG tolerance") {
    import Multimodal.Codec
    // flat gray frames survive the per-frame DCT nearly exactly — the
    // same tolerance discipline as the still-JPEG test; the container
    // walk itself (chunk tree, alignment, strf dims) is exact
    val frames = Seq.tabulate(4)(f => Array.fill[Byte](16 * 16)((40 * f + 30).toByte))
    val (w, h, out) = Codec.decodeAviMjpeg(Codec.encodeAviMjpeg(16, 16, frames))
    assert(w == 16 && h == 16 && out.length == 4)
    frames.zip(out).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs((x & 0xff) - (y & 0xff)) <= 4,
          s"luma ${y & 0xff} deviates from ${x & 0xff}")
      }
    }
    intercept[IllegalArgumentException](
      Codec.decodeAviMjpeg("RIFFxxxxAVI garbage".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      Codec.decodeAviMjpeg(Codec.encodeWavPcm16(8000, Array.fill[Short](10)(5))))
    // trailing bytes AFTER the declared RIFF payload are legal on disk
    // (padding, appended metadata) — the walk must stop at the RIFF
    // size, not parse the tail as chunks
    val padded = Codec.encodeAviMjpeg(16, 16, frames) ++
      Array.fill[Byte](13)(0x5a)
    val (w2, h2, out2) = Codec.decodeAviMjpeg(padded)
    assert(w2 == 16 && h2 == 16 && out2.length == 4)
  }

  test("video decode samples real frames uniformly from Y4M, GIF, and AVI streams") {
    import Multimodal.Codec
    val vids = media.filter(_.kind == "video").collect()
    assert(vids.nonEmpty)
    assert(Set("y4m", "gif", "avi-mjpeg").subsetOf(vids.map(_.meta.codec).toSet),
      "synthetic media must exercise the raw and BOTH compressed video paths")
    val decoded = Multimodal.decode(media, framesPerVideo = 3).collect()
      .groupBy(_.media_id)
    vids.foreach { v =>
      val (w, h, srcFrames) = v.meta.codec match {
        case "gif"       => Codec.decodeGifFrames(v.data)
        case "avi-mjpeg" => Codec.decodeAviMjpeg(v.data)
        case _           => Codec.decodeY4m(v.data)
      }
      val sampled = decoded(v.media_id).sortBy(_.frame_idx)
      assert(sampled.length == 3)
      // first and last sampled frames are the stream's first and last
      assert(sampled.head.pixels.sameElements(srcFrames.head))
      assert(sampled.last.pixels.sameElements(srcFrames.last))
      // every sampled frame is bit-identical to SOME source frame
      sampled.foreach(s => assert(srcFrames.exists(_.sameElements(s.pixels))))
      assert(sampled.forall(s => s.width == w && s.height == h))
    }
  }

  test("WAV PCM16 codec round-trips a sine wave") {
    import Multimodal.Codec
    val rate = 8000
    val samples = Array.tabulate[Short](800)(i =>
      (math.sin(2 * math.Pi * 440 * i / rate) * 16384).toShort)
    val (outRate, channels, mono) = Codec.decodeWavPcm16(Codec.encodeWavPcm16(rate, samples))
    assert(outRate == rate && channels == 1 && mono.length == 800)
    samples.zip(mono).foreach { case (s, f) =>
      assert(math.abs(f - s / 32768.0f) < 1e-6f)
    }
  }

  test("codecs reject truncated or foreign payloads with clear errors") {
    import Multimodal.Codec
    val ppm = Codec.encodePpm(4, 4, Array.fill[Byte](48)(7))
    val wav = Codec.encodeWavPcm16(8000, Array.fill[Short](100)(5))
    val y4m = Codec.encodeY4m(4, 4, Seq(Array.fill[Byte](16)(9)))
    // truncated pixel/sample/frame data
    intercept[IllegalArgumentException](Codec.decodePpm(ppm.dropRight(10)))
    intercept[IllegalArgumentException](Codec.decodeWavPcm16(wav.dropRight(10)))
    intercept[IllegalArgumentException](Codec.decodeY4m(y4m.dropRight(10)))
    // wrong magic routes to a clear message, not a parse crash
    intercept[IllegalArgumentException](Codec.decodePpm(wav))
    intercept[IllegalArgumentException](Codec.decodeWavPcm16(ppm.take(44) ++ ppm))
    intercept[IllegalArgumentException](Codec.decodeY4m(ppm))
    // hostile PPM header whose w*h*3 overflows int must not slip past
    // the truncation guard into a NegativeArraySizeException
    val hostile = "P6\n65536 65536\n255\n".getBytes("US-ASCII") ++ Array.fill[Byte](16)(1)
    intercept[IllegalArgumentException](Codec.decodePpm(hostile))
    // fmt chunk declaring 0 channels: clear require, not / by zero
    val zeroCh = {
      val bb = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36).put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(0) // PCM, 0 channels
        .putInt(8000).putInt(0).putShort(0).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(0)
      bb.array()
    }
    intercept[IllegalArgumentException](Codec.decodeWavPcm16(zeroCh))
  }

  test("zero-sample audio clips embed as zero vectors, not NaN") {
    import Multimodal.Codec
    val (_, _, empty) = Codec.decodeWavPcm16(Codec.encodeWavPcm16(8000, Array.empty[Short]))
    assert(empty.isEmpty)
    import spark.implicits._
    val clips = Seq(Multimodal.AudioClip(1L, 8000, 0, Array.empty[Float])).toDS()
    val vec = Multimodal.audioFeatures(clips).collect()(0)
      .getAs[scala.collection.Seq[Float]]("embedding")
    assert(vec.length == 16 && vec.forall(_ == 0f))
  }

  test("audio decode + waveform features run over real WAV payloads") {
    val clips = Multimodal.decodeAudio(media).collect()
    assert(clips.length == media.filter(_.kind == "audio").count())
    clips.foreach { c =>
      assert(c.sample_rate == 8000)
      assert(c.n_samples == c.samples.length && c.n_samples > 0)
      assert(c.samples.forall(s => s >= -1.0f && s <= 1.0f))
    }
    val feats = Multimodal.audioFeatures(Multimodal.decodeAudio(media))
    feats.collect().foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
      assert(v.length == 16)
      // a sine wave has nonzero RMS energy in every window
      assert(v.forall(x => x > 0f && !x.isNaN))
    }
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
