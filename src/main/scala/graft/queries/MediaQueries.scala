package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.TextQueries
import graft.functions.LangId
import graft.operators.Multimodal

/** Multimodal-column and language-ID queries (north-star operator
  * families). The binary payloads derive from document text (no media
  * libs in the container — SURVEY-mandated stub), but schema,
  * batching, and partition behavior are production-shaped. */
object MediaQueries {

  /** Binary column + metadata: the oracle-checkable part of the
    * multimodal plumbing (payload sizing/slicing is pure arithmetic). */
  def binaryMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.withBinaryContent(Tables.documents(s, dir))
      .select($"doc_id",
        octet_length($"content").cast("long").as("n_bytes"),
        // codepoint of the first char (rolling hash of a 1-char string
        // IS its codepoint); empty text → -1 matching DuckDB unicode('')
        when(length($"text") === 0, lit(-1L))
          .otherwise(TextQueries.fingerprint(substring($"text", 1, 1))).as("first_cp"),
        substring($"text", 1, 8).as("head"))
      .orderBy($"doc_id")
  }

  val binaryMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(unicode(text[1:1]) AS BIGINT) AS first_cp,
      |  text[1:8] AS head
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Frame sampling: stride-4 64-byte frames; frame count and first
    * frame size are arithmetic → oracle-checkable. */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.sampleFrames(
      Multimodal.withBinaryContent(Tables.documents(s, dir)), frameBytes = 64, stride = 4)
      .select($"doc_id",
        size($"frames").cast("long").as("n_frames"),
        coalesce(octet_length(try_element_at($"frames", lit(1))).cast("long"), lit(0L))
          .as("first_frame_bytes"))
      .orderBy($"doc_id")
  }

  val frameSampleSql: String =
    """SELECT doc_id,
      |  CAST(floor((ceil(octet_length(encode(text)) / 64.0) - 1) / 4) + 1 AS BIGINT) AS n_frames,
      |  CAST(least(64, octet_length(encode(text))) AS BIGINT) AS first_frame_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Batched (stub) decode + feature extraction via mapPartitions —
    * rows-only (hash-derived embeddings aren't SQL-reproducible);
    * MultimodalSpec pins determinism and unit-norm. No global sort:
    * a total order on a per-doc map output is semantically inert and
    * its range-sampling pass would run the featurizer twice (see
    * SentimentQueries.vaderDocs). */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.featurize(Tables.documents(s, dir), dim = 16, batchSize = 32)
      .select($"doc_id", $"meta.nBytes".as("n_bytes"), $"meta.format".as("format"),
        $"meta.width".as("width"), $"meta.height".as("height"),
        round(element_at($"embedding", 1), 6).as("e0"),
        round(element_at($"embedding", 2), 6).as("e1"))
  }

  /** Language-ID heuristic over documents — rows-only (per-language
    * profile scoring is a Scala function; LangIdSpec pins goldens).
    * No global sort — same rationale as [[mediaFeatures]]. */
  def langIdDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val detect = udf((t: String) => LangId.detect(t))
    Tables.documents(s, dir)
      .withColumn("d", detect($"text"))
      .select($"doc_id", $"lang".as("labeled_lang"),
        $"d.lang".as("detected_lang"), round($"d.confidence", 4).as("confidence"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_binary_meta" -> (binaryMeta _),
    "q51_frame_sample" -> (frameSample _),
    "q52_media_features" -> (mediaFeatures _),
    "q53_langid_docs" -> (langIdDocs _),
  )

  val oracles: Map[String, String] = Map(
    "q50_binary_meta" -> binaryMetaSql,
    "q51_frame_sample" -> frameSampleSql,
  )
}
