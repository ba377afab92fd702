package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Multimodal column plumbing (north star in BASELINE.json): treat
  * image/audio/video as opaque `binary` columns + typed metadata, with
  * decode / feature-extract / frame-sample stages whose *Spark-side
  * shape* (schema, partitioning, batched execution) is real and
  * tested, while the codec itself is a clearly-marked deterministic
  * STUB (no image/audio libraries ship in this container).
  *
  * Execution model: `featurize` uses `mapPartitions` over a typed
  * Dataset and processes rows in fixed-size batches — the exact shape
  * a real encoder needs (model loaded once per partition, inputs fed
  * in batches of `batchSize`, results zipped back). Swapping the stub
  * for ONNX/JNI inference changes only the inside of
  * `decodeAndEmbedBatch`. At 100 TB this stage is a pure map — no
  * shuffle — and scales with executor count; binary payloads stay
  * columnar (parquet BYTE_ARRAY) end to end.
  */
object Multimodal {

  /** Typed metadata extracted by the (stub) decoder. */
  final case class MediaMeta(nBytes: Long, format: String, width: Int, height: Int, frames: Int)
  final case class MediaRow(doc_id: Long, content: Array[Byte])
  final case class FeatureRow(doc_id: Long, meta: MediaMeta, embedding: Array[Float])

  /** STUB decode — deterministic pseudo-metadata from the payload
    * header. A real implementation would parse the container format
    * here (???-equivalent; see file Scaladoc). */
  private[graft] def decodeMeta(bytes: Array[Byte]): MediaMeta = {
    val h = MurmurHash3.bytesHash(bytes, 7)
    val formats = Array("png", "jpeg", "webp", "wav")
    val fmt = formats(math.abs(h % 4))
    MediaMeta(bytes.length.toLong, fmt,
      width = 64 + math.abs((h >> 4) % 1024),
      height = 64 + math.abs((h >> 8) % 1024),
      frames = 1 + math.abs((h >> 16) % 32))
  }

  /** STUB feature extraction for one batch — deterministic hash-mixed
    * unit vector per payload (stands in for batched model inference). */
  private[graft] def decodeAndEmbedBatch(batch: Seq[MediaRow], dim: Int): Seq[FeatureRow] =
    batch.map { r =>
      val v = new Array[Float](dim)
      var j = 0
      while (j < dim) {
        v(j) = (MurmurHash3.bytesHash(r.content, j) / Int.MaxValue.toFloat)
        j += 1
      }
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      val unit = if (norm == 0f) v else v.map(_ / norm)
      FeatureRow(r.doc_id, decodeMeta(r.content), unit)
    }

  /** Attach a binary content column (fixture: the UTF-8 payload of the
    * doc text stands in for a media blob). */
  def withBinaryContent(docs: DataFrame): DataFrame =
    docs.withColumn("content", encode(coalesce(col("text"), lit("")), "UTF-8"))

  /** Batched decode + feature extraction via mapPartitions (the
    * mapInPandas-equivalent batch shape in Scala). */
  def featurize(docs: DataFrame, dim: Int = 16, batchSize: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val media: Dataset[MediaRow] =
      withBinaryContent(docs).select(col("doc_id"), col("content")).as[MediaRow]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => decodeAndEmbedBatch(b.toSeq, dim))
    }.toDF()
  }

  /** Frame sampling: split the payload into fixed-size "frames" and
    * keep every `stride`-th — array<binary> out, ready to explode into
    * a per-frame pipeline. Pure column ops (no UDF). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val nFrames = floor((octet_length(col("content")) - 1) / frameBytes) + 1
    media.withColumn("frames",
      // zero-length content → empty frame list (sequence(0,-1) throws)
      when(octet_length(col("content")) === 0,
        array().cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.BinaryType)))
        .otherwise(transform(sequence(lit(0), (nFrames - 1).cast("int"), lit(stride)),
          i => substring(col("content"), (i * frameBytes + 1).cast("int"), lit(frameBytes)))))
  }
}
