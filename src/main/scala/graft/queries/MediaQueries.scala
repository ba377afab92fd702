package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Export._
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
    // sort-before-project: see TextQueries.tokenStats
    Multimodal.withBinaryContent(
        Tables.documents(s, dir).select($"doc_id", $"text").orderBy($"doc_id"))
      .select($"doc_id",
        octet_length($"content").cast("long").as("n_bytes"),
        // codepoint of the first char (rolling hash of a 1-char string
        // IS its codepoint); empty text → -1 matching DuckDB unicode('')
        when(length($"text") === 0, lit(-1L))
          .otherwise(TextQueries.fingerprint(substring($"text", 1, 1))).as("first_cp"),
        substring($"text", 1, 8).as("head"))
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
    // sort-before-project: see TextQueries.tokenStats
    Multimodal.sampleFrames(
      Multimodal.withBinaryContent(
        Tables.documents(s, dir).select($"doc_id", $"text").orderBy($"doc_id")),
      frameBytes = 64, stride = 4)
      .select($"doc_id",
        size($"frames").cast("long").as("n_frames"),
        coalesce(octet_length(try_element_at($"frames", lit(1))).cast("long"), lit(0L))
          .as("first_frame_bytes"))
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
    Tables.documents(s, dir)
      .withColumn("d", graft.functions.LangIdDetect.lang_id($"text"))
      .select($"doc_id", $"lang".as("labeled_lang"),
        $"d.lang".as("detected_lang"), round($"d.confidence", 4).as("confidence"))
  }

  /** q52 as a SELF-VALIDATING query (the hash-mixed stub embeddings
    * are not SQL-expressible, so the oracle pins the featurizer's
    * CONTRACTS instead): every doc is featurized exactly once
    * (count), the metadata byte size round-trips to what DuckDB
    * computes from the same text (a REAL cross-engine number, not a
    * pinned boolean), embeddings are unit-norm float vectors of the
    * requested dimension, and the decoded metadata stays in its
    * declared ranges. The batched mapPartitions featurize runs
    * unchanged underneath. */
  def mediaFeaturesValidated(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.featurize(Tables.documents(s, dir), dim = 16, batchSize = 32)
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"meta.nBytes").cast("long").as("sum_bytes"),
        // coalesce: bool_and over ZERO docs is NULL, not a violated
        // theorem — vacuous truth on empty corpora (the q44 rule)
        coalesce(expr("bool_and(size(embedding) = 16)"), lit(true)).as("dim_ok"),
        coalesce(expr("bool_and(meta.nBytes = 0 or abs(aggregate(embedding, cast(0.0 as double), (a, x) -> a + cast(x as double) * x) - 1.0) <= 1e-3)"), lit(true)).as("unit_norm"),
        coalesce(expr("bool_and(meta.format in ('png','jpeg','webp','wav'))"), lit(true)).as("format_known"),
        coalesce(expr("bool_and(meta.width >= 64 and meta.width < 1088 and meta.height >= 64 and meta.height < 1088 and meta.frames between 1 and 32)"), lit(true)).as("meta_in_range"))
  }

  val mediaFeaturesValidatedSql: String =
    """SELECT count(*) AS n_docs,
      |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
      |  true AS dim_ok, true AS unit_norm, true AS format_known, true AS meta_in_range
      |FROM documents""".stripMargin

  /** q53 self-validation: per labeled-language totals (REAL grouped
    * counts DuckDB reproduces from the `lang` column) with the
    * detector's totality contracts — every doc classified, language
    * code from the supported set, confidence ∈ [0,1]. Detection
    * ACCURACY is deliberately not pinned here: the synthetic fixture
    * text is vocabulary soup on which stopword profiles score ~0.2,
    * so accuracy is a golden-test concern (LangIdSpec) not an
    * invariant; what the query pins is that the detector is total
    * and well-typed over every language block. */
  def langIdValidated(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("d", graft.functions.LangIdDetect.lang_id($"text"))
      .groupBy(coalesce($"lang", lit("und")).as("labeled_lang"))
      .agg(count(lit(1)).as("n_docs"),
        expr("bool_and(d is not null)").as("all_classified"),
        expr("bool_and(d.lang in ('en','de','es','fr','pt','it','nl','zh','und'))").as("lang_valid"),
        expr("bool_and(d.confidence between 0 and 1)").as("conf_in_range"))
      .domainOrdered($"labeled_lang")
  }

  val langIdValidatedSql: String =
    """SELECT coalesce(lang, 'und') AS labeled_lang, count(*) AS n_docs,
      |  true AS all_classified, true AS lang_valid, true AS conf_in_range
      |FROM documents GROUP BY 1 ORDER BY labeled_lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_binary_meta" -> (binaryMeta _),
    "q51_frame_sample" -> (frameSample _),
    "q52_media_features" -> (mediaFeaturesValidated _),
    "q53_langid_docs" -> (langIdValidated _),
  )

  val oracles: Map[String, String] = Map(
    "q50_binary_meta" -> binaryMetaSql,
    "q51_frame_sample" -> frameSampleSql,
    "q52_media_features" -> mediaFeaturesValidatedSql,
    "q53_langid_docs" -> langIdValidatedSql,
  )
}
