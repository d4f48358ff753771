package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal._

/** Multimodal plumbing: binary column handling, decode metadata,
  * frame-sampling slice arithmetic, feature shape + determinism. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val media = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "audio payload with some words in it for the test"),
      (2L, "video payload carrying enough bytes to slice into frames ok"))
      .toDF("doc_id", "text")
  }

  test("mediaFromDocs assigns types round-robin and keeps bytes") {
    val rows = Multimodal.mediaFromDocs(media).collect()
    assert(rows.map(_.media_type).toSeq == Seq("image", "audio", "video"))
    assert(rows.forall(_.content.nonEmpty))
  }

  test("decode derives type-appropriate metadata") {
    val d = Multimodal.decode(Multimodal.mediaFromDocs(media)).collect()
      .map(r => r.media_type -> r).toMap
    assert(d("image").width >= 64 && d("image").n_frames == 1)
    assert(d("audio").sample_rate == 16000 && d("audio").duration_s > 0)
    assert(d("video").n_frames >= 8)
  }

  test("sampleFrames slices video payload into every-2nd frame") {
    val m = Multimodal.mediaFromDocs(media)
    val frames = Multimodal.sampleFrames(m, everyN = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.doc_id == 2L))
    val video = m.collect().find(_.media_type == "video").get
    val d = StubCodec.decode(video)
    assert(frames.length == (d.n_frames + 1) / 2)
    val frameSize = video.content.length / d.n_frames
    assert(frames.forall(_.frame_bytes.length == frameSize))
  }

  test("sampleFrames emits empty slices for payloads shorter than n_frames") {
    import spark.implicits._
    val tiny = Seq((2L, "abcde")).toDF("doc_id", "text") // video class, 5 bytes
    val m = Multimodal.mediaFromDocs(tiny)
    val d = StubCodec.decode(m.head())
    assert(d.n_frames > 5) // frameSize = 5 / n_frames = 0
    val frames = Multimodal.sampleFrames(m, everyN = 2).collect()
    assert(frames.length == (d.n_frames + 1) / 2)
    assert(frames.forall(_.frame_bytes.isEmpty))
  }

  test("extractFeatures yields L1-normalized 16-dim histograms") {
    val f = Multimodal.extractFeatures(Multimodal.mediaFromDocs(media))
      .collect()
    assert(f.forall(_.embedding.length == 16))
    f.foreach { r =>
      val l1 = r.embedding.map(_.toDouble).sum
      assert(math.abs(l1 - 1.0) < 1e-5, s"l1=$l1")
    }
    // deterministic across runs
    val again = Multimodal.extractFeatures(Multimodal.mediaFromDocs(media))
      .collect()
    assert(f.map(_.embedding.toSeq).toSeq == again.map(_.embedding.toSeq).toSeq)
  }

  test("resizeImages truncates only oversized image payloads") {
    val out = Multimodal.resizeImages(Multimodal.mediaFromDocs(media), 10)
      .collect().map(r => r.media_type -> r.content.length).toMap
    assert(out("image") == 10)
    assert(out("audio") > 10 && out("video") > 10)
  }
}
