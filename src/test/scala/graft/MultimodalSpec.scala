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

  test("decodeMeta stub is deterministic and size-faithful") {
    val bytes = "hello media".getBytes("UTF-8")
    val m1 = Multimodal.decodeMeta(bytes)
    val m2 = Multimodal.decodeMeta(bytes)
    assert(m1 == m2)
    assert(m1.nBytes == bytes.length)
    assert(m1.width >= 64 && m1.height >= 64 && m1.frames >= 1)
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
