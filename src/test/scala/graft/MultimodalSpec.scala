package graft

import org.apache.spark.sql.functions._
import graft.functions.LangId
import graft.operators.Multimodal

/** Multimodal plumbing: schema, batch shape, determinism, frame
  * sampling; LangId goldens on real-language sentences. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("featurize: schema, unit-norm embeddings, determinism across runs") {
    val docs = Tables.documents(spark, sf).limit(100)
    val f1 = Multimodal.featurize(docs, dim = 16, batchSize = 32)
    assert(f1.columns.toSeq == Seq("doc_id", "meta", "embedding"))
    val rows = f1.collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val emb = r.getSeq[Float](2)
      assert(emb.length == 16)
      val norm = math.sqrt(emb.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-3, s"not unit norm: $norm")
    }
    val again = Multimodal.featurize(docs, dim = 16, batchSize = 7) // different batch size
    val a = rows.map(r => (r.getLong(0), r.getSeq[Float](2))).sortBy(_._1)
    val b = again.collect().map(r => (r.getLong(0), r.getSeq[Float](2))).sortBy(_._1)
    a.zip(b).foreach { case ((ida, ea), (idb, eb)) =>
      assert(ida == idb && ea == eb, "batch size must not change results")
    }
  }

  test("decodeMeta fallback is deterministic and size-faithful on non-image bytes") {
    val bytes = "hello media".getBytes("UTF-8")
    val m1 = Multimodal.decodeMeta(bytes)
    val m2 = Multimodal.decodeMeta(bytes)
    assert(m1 == m2)
    assert(m1.nBytes == bytes.length)
    assert(m1.width >= 64 && m1.height >= 64 && m1.frames >= 1)
  }

  /** Encode a w×h image through the JDK codec; pixel (x,y) gets the
    * RGB produced by `paint`. */
  private def encodeImage(fmt: String, w: Int, h: Int)(paint: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, paint(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos))
    bos.toByteArray
  }

  test("real PNG/JPEG decode: true metadata, not the hash fallback") {
    val png = encodeImage("png", 37, 21)((x, y) => ((x * 7) << 16) | ((y * 11) << 8) | 128)
    val jpg = encodeImage("jpg", 48, 32)((x, y) => if ((x + y) % 2 == 0) 0xFFFFFF else 0)
    val mPng = Multimodal.decodeMeta(png)
    assert(mPng.format == "png" && mPng.width == 37 && mPng.height == 21 && mPng.frames == 1)
    assert(mPng.nBytes == png.length)
    val mJpg = Multimodal.decodeMeta(jpg)
    assert(mJpg.format == "jpeg" && mJpg.width == 48 && mJpg.height == 32)
    // a truncated PNG header must degrade to the fallback, not throw
    val truncated = png.take(20)
    val mTrunc = Multimodal.decodeMeta(truncated)
    assert(mTrunc.nBytes == 20)
  }

  /** Encode 16-bit PCM mono samples into a real WAV container via the
    * JDK codec; `sample(i)` in [-1, 1]. */
  private def encodeWav(n: Int, rate: Float = 8000f)(sample: Int => Double): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val raw = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = math.max(-32768, math.min(32767, (sample(i) * 32767).toInt))
      raw(i * 2) = (v & 0xFF).toByte
      raw(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV decode: true sample-rate/channel/frame metadata and energy-profile embeddings") {
    val n = 4000
    // burst in the FIRST half vs the SECOND half: the windowed RMS
    // profile must separate them (negative cosine); same-burst clips
    // must be deterministic
    val early = encodeWav(n)(i => if (i < n / 2) math.sin(i * 0.3) else 0.0)
    val late  = encodeWav(n)(i => if (i >= n / 2) math.sin(i * 0.3) else 0.0)
    val mEarly = Multimodal.decodeMeta(early)
    assert(mEarly.format == "wav" && mEarly.width == 8000 && mEarly.height == 1
      && mEarly.frames == n, s"$mEarly")
    assert(mEarly.nBytes == early.length)
    val out = Multimodal.featurizeBinary(
      Seq((1L, early), (2L, late)).toDF("doc_id", "content"), dim = 16, batchSize = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    out.values.foreach { emb =>
      val norm = math.sqrt(emb.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-3, s"not unit norm: $norm")
    }
    val cos = out(1L).zip(out(2L)).map { case (a, b) => a.toDouble * b }.sum
    assert(cos < 0, s"early vs late energy profiles should oppose, got $cos")
    // truncated WAV header degrades to the fallback, never throws
    val m = Multimodal.decodeMeta(early.take(16))
    assert(m.nBytes == 16)
  }

  test("featurizeBinary over real decoded frames: q52 byte/feature contracts hold") {
    // Dark, light, and gradient images: the luminance embedding must be
    // unit-norm, deterministic, and separate dark from light (cosine<1).
    val dark  = encodeImage("png", 64, 64)((_, _) => 0x101010)
    val light = encodeImage("png", 64, 64)((_, _) => 0xF0F0F0)
    val grad  = encodeImage("png", 64, 64)((x, _) => { val v = x * 4; (v << 16) | (v << 8) | v })
    val text  = "not an image at all".getBytes("UTF-8")
    val media = Seq((1L, dark), (2L, light), (3L, grad), (4L, text))
      .toDF("doc_id", "content")
    val out = Multimodal.featurizeBinary(media, dim = 16, batchSize = 2)
    assert(out.columns.toSeq == Seq("doc_id", "meta", "embedding"))
    val rows = out.collect().map(r => r.getLong(0) ->
      (r.getStruct(1), r.getSeq[Float](2))).toMap
    assert(rows.size == 4)
    // byte contract: meta.nBytes equals the real payload length for every row
    assert(rows(1L)._1.getLong(0) == dark.length)
    assert(rows(4L)._1.getLong(0) == text.length)
    // real image rows carry true decoded dimensions
    Seq(1L, 2L, 3L).foreach { id =>
      val m = rows(id)._1
      assert(m.getString(1) == "png" && m.getInt(2) == 64 && m.getInt(3) == 64)
    }
    // unit-norm feature contract over decoded pixels
    rows.values.foreach { case (_, emb) =>
      val norm = math.sqrt(emb.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-3, s"not unit norm: $norm")
    }
    // dark cells pool below 0.5, light above: embeddings must oppose
    val cos = rows(1L)._2.zip(rows(2L)._2).map { case (a, b) => a.toDouble * b }.sum
    assert(cos < 0, s"dark vs light cosine should be negative, got $cos")
    // determinism: re-run with a different batch size gives identical vectors
    val again = Multimodal.featurizeBinary(media, dim = 16, batchSize = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    rows.foreach { case (id, (_, emb)) => assert(again(id) == emb) }
  }

  test("sampleFrames: stride-4 64-byte frames with correct sizes; empty content → no frames") {
    val df = Seq((1L, "x" * 300), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.sampleFrames(Multimodal.withBinaryContent(df))
      .select("doc_id", "frames").collect().map(r => r.getLong(0) -> r.getSeq[Array[Byte]](1)).toMap
    val frames = out(1L)
    // 300 bytes → frames at offsets 0,4*64=256 → 2 sampled frames
    assert(frames.length == 2, s"got ${frames.length}")
    assert(frames(0).length == 64)
    assert(frames(1).length == 300 - 256)
    assert(out(2L).isEmpty, "empty content must yield an empty frame list, not a crash")
  }

  test("LangId goldens per script/stopword profile") {
    assert(LangId.detect("the quick brown fox jumps over the lazy dog and it is fine").lang == "en")
    assert(LangId.detect("der Hund und die Katze sind nicht für immer zusammen").lang == "de")
    assert(LangId.detect("el perro y la gata que viven en una casa").lang == "es")
    assert(LangId.detect("le chien et le chat sont dans la maison pour la nuit").lang == "fr")
    assert(LangId.detect("今天天气很好我们去公园散步").lang == "zh")
    assert(LangId.detect("") == LangId.Unknown)
    assert(LangId.detect(null) == LangId.Unknown)
    assert(LangId.detect("12345 !!! ???") == LangId.Unknown)
  }

  test("LangId is total on fuzz input") {
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val s = (0 until rnd.nextInt(50)).map(_ => (rnd.nextInt(0xFFFD) + 1).toChar).mkString
      val r = LangId.detect(s)
      assert(r.confidence >= 0.0 && r.confidence <= 1.0)
      assert(r.lang.nonEmpty)
    }
  }
}
