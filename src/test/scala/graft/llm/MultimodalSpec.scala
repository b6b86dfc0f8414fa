package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class MultimodalSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("image decode is real: PNG round-trip recovers exact dimensions and pixels") {
    // encode a known 16x16 image, decode through the engine kernel
    val f = Multimodal.decodeImage(7L, Multimodal.pngBytes(7L))
    assert(f.decode_ok)
    assert((f.width, f.height, f.channels) === (16, 16, 3))
    // PNG is lossless: the luma must equal the luma of the generator's
    // pixels, computed independently here
    var expected = 0.0
    for (y <- 0 until 16; x <- 0 until 16) {
      val p = ((7L * 1315423911L + x * 2654435761L + y * 97531L) & 0xffffff).toInt
      expected += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
        0.114 * (p & 0xff)
    }
    assert(f.mean_luma === math.rint(expected / 256 * 1000) / 1000)
  }

  test("undecodable payload records decode_ok=false, never throws (media P4)") {
    val f = Multimodal.decodeImage(1L, "this is not an image".getBytes)
    assert(!f.decode_ok && f.n_bytes === 20L)
    val a = Multimodal.decodeWav(1L, "nor audio".getBytes)
    assert(!a.decode_ok)
    // resize keeps the row too — input/output counts must reconcile
    val df = Seq(9L).toDF("doc_id")
      .withColumn("media", lit("junk bytes".getBytes))
    val r = Multimodal.resizeFeatures(spark, df, targetW = 8).collect()
    assert(r.length === 1 && !r.head.decode_ok)
  }

  test("odd-length RIFF metadata chunk (padded per spec) doesn't derail the walk") {
    import java.nio.{ByteBuffer, ByteOrder}
    // spec-valid WAV: fmt, then an odd-length LIST chunk + pad byte, then data
    val wav = Multimodal.wavBytes(3L)
    val listBody = "INFOx".getBytes // 5 bytes, odd
    val out = ByteBuffer.allocate(wav.length + 8 + 6).order(ByteOrder.LITTLE_ENDIAN)
    out.put(wav, 0, 36) // RIFF header + fmt chunk
    out.put("LIST".getBytes).putInt(5).put(listBody).put(0.toByte) // pad
    out.put(wav, 36, wav.length - 36) // data chunk
    // fix up the RIFF size field
    out.putInt(4, wav.length - 8 + 14)
    val a = Multimodal.decodeWav(3L, out.array())
    assert(a.decode_ok)
    assert(a.n_samples === 1600 && a.duration_ms === 200)
  }

  test("adversarial RIFF chunk lengths terminate, recorded as bad (no infinite loop)") {
    import java.nio.{ByteBuffer, ByteOrder}
    // valid RIFF/WAVE preamble, then a chunk claiming length -8: the naive
    // cursor math would rewind and spin forever
    val buf = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(16).put("WAVE".getBytes)
    buf.put("JUNK".getBytes).putInt(-8)
    assert(!Multimodal.decodeWav(1L, buf.array()).decode_ok)
    // and an over-long claimed chunk
    val buf2 = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    buf2.put("RIFF".getBytes).putInt(16).put("WAVE".getBytes)
    buf2.put("data".getBytes).putInt(1 << 30)
    assert(!Multimodal.decodeWav(1L, buf2.array()).decode_ok)
  }

  test("resize kernel scales for real: dims honored, output is a decodable PNG") {
    val df = Seq(1L).toDF("doc_id")
      .withColumn("media", lit(Multimodal.pngBytes(1L)))
    val r = Multimodal.resizeFeatures(spark, df, targetW = 8).collect().head
    assert((r.width, r.height, r.target_w, r.target_h) === (16, 16, 8, 8))
    assert(r.scaled_bytes > 0 && r.scaled_bytes < r.orig_bytes)
  }

  test("wav decode is real: sample rate, duration, and RMS from the PCM stream") {
    val a = Multimodal.decodeWav(3L, Multimodal.wavBytes(3L))
    assert(a.decode_ok)
    assert(a.sample_rate === 8000 && a.n_channels === 1)
    assert(a.n_samples === 1600 && a.duration_ms === 200)
    // a full-scale-12000 sine has RMS ~ 12000/sqrt(2) ~ 8485
    assert(a.rms > 8000 && a.rms < 9000, a.rms.toString)
  }

  test("decode pass over a frame: one feature row per doc, all decodable") {
    val docs = (1L to 20L).toDF("doc_id").withColumn("text", lit("x"))
    val feats = Multimodal.decodeFeatures(spark,
      Multimodal.withImagePayload(spark, docs)).collect()
    assert(feats.length === 20)
    assert(feats.forall(_.decode_ok))
    assert(feats.map(_.doc_id).toSet === (1L to 20L).toSet)
  }
}
