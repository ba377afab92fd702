package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 ad-hoc decomposition of the current bench heads:
  * q74/q58 (IVF), q43 (minhash), q73 (PII). Not driver contract. */
object ProfileR7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(df: => DataFrame): Unit = {
      // min of 2 to shave one-off noise; first run of a shape pays codegen
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[r7] $label%-44s cold ${times.head}%.2f  warm ${times.min}%.2f s")
    }

    spark.range(1000).selectExpr("id % 7 k").groupBy("k").count()
      .write.format("noop").mode("overwrite").save()
    Tables.documents(spark, sfDir).select(count(lit(1))).count()
    Tables.embeddings(spark, sfDir).select(count(lit(1))).count()

    // ---- q74 decomposition ----
    import graft.functions.expressions._
    time("q74 full")(graft.queries.SimilarityQueries.ivfTopk(spark, sfDir))
    val t0 = System.nanoTime()
    val cent = {
      val sample = Tables.embeddings(spark, sfDir)
        .filter($"vec_id" < 256).orderBy($"vec_id")
        .select($"embedding").as[Array[Float]].collect()
      sample
    }
    println(f"[r7] trainCentroids collect only                 ${(System.nanoTime()-t0)/1e9}%.2f s (${cent.length} rows)")
    time("q74 full again (warm shapes)")(graft.queries.SimilarityQueries.ivfTopk(spark, sfDir))

    // ---- q73 decomposition ----
    time("q73 full (select->orderBy)")(graft.queries.TrainQueries.piiRedact(spark, sfDir))
    val pats = graft.queries.TrainQueries.piiPatterns
    def redactCols: (Column, Column) = {
      val (red, counts) = pats.foldLeft(($"text": Column, List.empty[Column])) {
        case ((c, cs), (pat, tag)) =>
          (regexp_replace(c, pat, tag),
            size(regexp_extract_all(c, lit(pat), lit(0))).cast("long") :: cs)
      }
      (red, counts.reduce(_ + _))
    }
    time("q73 no sort") {
      val (red, n) = redactCols
      Tables.documents(spark, sfDir)
        .select($"doc_id", n.as("n_pii"),
          graft.queries.TextQueries.fingerprint(red).as("redacted_fp"))
    }
    time("q73 sort-then-project") {
      val (red, n) = redactCols
      Tables.documents(spark, sfDir)
        .select($"doc_id", $"text").orderBy($"doc_id")
        .select($"doc_id", n.as("n_pii"),
          graft.queries.TextQueries.fingerprint(red).as("redacted_fp"))
    }
    time("q73 replace only, no counts, no sort") {
      val (red, _) = redactCols
      Tables.documents(spark, sfDir)
        .select($"doc_id", graft.queries.TextQueries.fingerprint(red).as("redacted_fp"))
    }
    time("q73 counts only, no replace, no sort") {
      val (_, n) = redactCols
      Tables.documents(spark, sfDir).select($"doc_id", n.as("n_pii"))
    }

    // ---- q74 internals (reimplemented here to decompose) ----
    {
      import org.apache.spark.sql.expressions.Window
      val centD: Array[Array[Double]] = {
        val sample = Tables.embeddings(spark, sfDir)
          .filter($"vec_id" < 256).orderBy($"vec_id")
          .select($"embedding").as[Array[Float]].collect()
        sample.take(16).map(_.map(_.toDouble))  // skip k-means; shape identical
      }
      val cosines = centD.map(c => cosine_similarity($"embedding", typedlit(c.toSeq)))
      val cell = array_position(array(cosines: _*), array_max(array(cosines: _*))).cast("int")
      val scored = array(cosines.zipWithIndex.map { case (c, i) =>
        struct(c.as("c"), lit(i + 1).as("i")) }: _*)
      val probeCells = transform(
        slice(array_sort(scored, (l, r) =>
          when(l("c") > r("c"), -1).otherwise(when(l("c") < r("c"), 1).otherwise(0))),
          1, 4),
        x => x("i").cast("int"))
      val e = Tables.embeddings(spark, sfDir)
      time("q74: b-side cell assign only")(e.select($"vec_id", cell.as("cell")))
      time("q74: a-side probe explode only")(
        e.select($"vec_id", explode(probeCells).as("cell")))
      val a = e.select($"vec_id".as("id_a"), $"embedding".as("emb_a"), explode(probeCells).as("cell"))
      val b = e.select($"vec_id".as("id_b"), $"embedding".as("emb_b"), cell.as("cell"))
      time("q74: join only")(
        a.hint("shuffle_hash").join(b, Seq("cell")).filter($"id_a" =!= $"id_b")
          .select($"id_a", $"id_b"))
      time("q74: join+cosine")(
        a.hint("shuffle_hash").join(b, Seq("cell")).filter($"id_a" =!= $"id_b")
          .withColumn("cosine", round(cosine_similarity($"emb_a", $"emb_b"), 6))
          .select($"id_a", $"id_b", $"cosine"))
      val w = Window.partitionBy($"id_a").orderBy($"cosine".desc, $"id_b")
      time("q74: join+cosine+window")(
        a.hint("shuffle_hash").join(b, Seq("cell")).filter($"id_a" =!= $"id_b")
          .withColumn("cosine", round(cosine_similarity($"emb_a", $"emb_b"), 6))
          .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
          .select($"id_a", $"id_b".as("nearest_id"), $"cosine", $"cell"))
      time("q74: broadcast join+cosine+window")(
        a.join(broadcast(b), Seq("cell")).filter($"id_a" =!= $"id_b")
          .withColumn("cosine", round(cosine_similarity($"emb_a", $"emb_b"), 6))
          .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
          .select($"id_a", $"id_b".as("nearest_id"), $"cosine", $"cell"))
      // min_by instead of window: single aggregate, no second shuffle
      time("q74: join+cosine+max_by agg")(
        a.hint("shuffle_hash").join(b, Seq("cell")).filter($"id_a" =!= $"id_b")
          .withColumn("cosine", round(cosine_similarity($"emb_a", $"emb_b"), 6))
          .groupBy($"id_a")
          .agg(max_by(struct($"id_b", $"cosine", $"cell"),
            struct($"cosine", -$"id_b")).as("m"))
          .select($"id_a", $"m.id_b".as("nearest_id"), $"m.cosine".as("cosine"), $"m.cell".as("cell")))
    }

    // ---- q43 decomposition ----
    time("q43 full")(graft.queries.DedupQueries.minhashDedup(spark, sfDir))

    // ---- q58 ----
    time("q58 full")(graft.queries.SimilarityQueries.ivfNnValidated(spark, sfDir))

    spark.stop()
  }
}
