package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Consolidated profiling driver (one main, subcommands — VERDICT r10
  * #5): measurement tooling, NOT part of the driver contract.
  *
  * Usage: `runMain graft.Profile <subcommand> [args]`
  *
  *  - `med <substr...>` — median-of-7 warm timer over registered
  *    queries matching any substring (round-9 noise control: identical
  *    code varies ±20–50% per query at the 0.1–0.5 s scale, so
  *    single-shot timings can't support any claim below ~1.5×).
  *  - `stage` — labeled sub-plan decomposition of the historically
  *    expensive shapes (minhash, within-label pairs, IVF, VADER,
  *    distinct) so optimization targets the real cost, not a guess.
  *  - `floor` — per-action scheduling/planning-floor probes (trivial
  *    scan/union/sort shapes; the BENCH_NOTES floor attributions).
  *
  * `SPARK_GRAFT_SF_DIR` selects the dataset (default sf0.1). The
  * retired one-off round decompositions (ProfileR7/ProfileR9/
  * ProfileIvf) live in git history; their conclusions are recorded as
  * BENCH_NOTES.md attributions and, where they changed a plan, in the
  * operator's own Scaladoc. */
object Profile {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // shared warm-up: JIT/codegen + table footers
    spark.range(1000).selectExpr("id % 7 k").groupBy("k").count()
      .write.format("noop").mode("overwrite").save()
    Tables.documents(spark, sfDir).select(count(lit(1))).count()
    try args.toList match {
      case "med" :: pats if pats.nonEmpty => med(spark, sfDir, pats)
      case "stage" :: Nil => stage(spark, sfDir)
      case "floor" :: Nil => floor(spark, sfDir)
      case "r20" :: Nil => r20(spark, sfDir)
      case other =>
        System.err.println(
          s"unknown profile subcommand '${other.mkString(" ")}'; " +
            "usage: Profile med <substr...> | stage | floor | r20")
        sys.exit(2)
    } finally spark.stop()
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Median-of-7 warm timings for registered queries by substring. */
  private def med(spark: SparkSession, sfDir: String, pats: Seq[String]): Unit = {
    Tables.events(spark, sfDir).select(count(lit(1))).count()
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => pats.exists(n.contains))
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val ts = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        noop(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[med] $name%-32s median ${ts(3)}%.3f  min ${ts.head}%.3f  max ${ts.last}%.3f")
    }
  }

  /** Labeled stage decomposition of the expensive query shapes. */
  private def stage(spark: SparkSession, sfDir: String): Unit = {
    import spark.implicits._
    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      noop(df)
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    import graft.functions.expressions._
    import graft.queries.DedupQueries.shingles
    val tokens = (c: org.apache.spark.sql.Column) => split(trim(c), "\\s+")

    time("q43 full")(graft.queries.DedupQueries.minhashDedup(spark, sfDir))
    time("docs scan only")(Tables.documents(spark, sfDir).select($"doc_id", $"text"))
    time("tokenize")(Tables.documents(spark, sfDir).select($"doc_id", tokens($"text").as("t")))
    time("shingles")(Tables.documents(spark, sfDir)
      .select($"doc_id", shingles(tokens($"text"), 3).as("sh")))
    time("fused sig n=3 k=128")(Tables.documents(spark, sfDir)
      .select($"doc_id", minhash_signature(tokens($"text"), n = 3, k = 128, seed = 42).as("sig")))
    time("q43 full again")(graft.queries.DedupQueries.minhashDedup(spark, sfDir))

    val e = Tables.embeddings(spark, sfDir).select($"vec_id", $"label", $"embedding")
    val a = e.select($"vec_id".as("id_a"), $"label", $"embedding".as("emb_a"))
    val b = e.select($"vec_id".as("id_b"), $"label", $"embedding".as("emb_b"))
    time("q45 pairs join only")(
      a.join(b, Seq("label")).filter($"id_b" > $"id_a").select($"id_a", $"id_b"))
    time("q45 pairs + cosine")(
      a.join(b, Seq("label")).filter($"id_b" > $"id_a")
        .select($"id_a", $"id_b", cosine_similarity($"emb_a", $"emb_b").as("c")))
    time("q45 full")(graft.queries.DedupQueries.embeddingNearDups(spark, sfDir))
    time("q47 full")(graft.queries.SimilarityQueries.nnWithinLabel(spark, sfDir))

    // fixed-cost decomposition
    time("floor: docs project only")(
      Tables.documents(spark, sfDir).select($"doc_id", length($"text").as("l")))
    time("floor + global orderBy")(
      Tables.documents(spark, sfDir).select($"doc_id", length($"text").as("l"))
        .orderBy($"doc_id"))
    time("floor + repart1 sortWithin")(
      Tables.documents(spark, sfDir).select($"doc_id", length($"text").as("l"))
        .repartition(1).sortWithinPartitions($"doc_id"))
    // IVF end-to-end (the sub-plan decomposition that diagnosed the
    // broadcast-of-probe-side pathology is retired; the conclusion —
    // shuffle-hash the cell join — is recorded in BENCH_NOTES.md and
    // encoded in SimilarityQueries.ivfNn itself, so Profile measures
    // only the real query and cannot drift from it)
    time("ivf full")(graft.queries.SimilarityQueries.ivfNn(spark, sfDir))
    val vaderUdf = udf((t: String) => graft.functions.Vader.score(t))
    val vaderNoSort = Tables.documents(spark, sfDir)
      .withColumn("v", vaderUdf(graft.queries.TextQueries.cleanText($"text")))
      .select($"doc_id", $"v.compound".as("compound"))
    time("q33 as-is")(graft.queries.SentimentQueries.vaderDocs(spark, sfDir))
    time("q33-like no sort")(vaderNoSort)
    time("q33-like repart1 sort")(vaderNoSort.repartition(1).sortWithinPartitions($"doc_id"))
    time("q09 as-is")(graft.queries.Relational.distinctParts(spark, sfDir))
    time("q33 again")(graft.queries.SentimentQueries.vaderDocs(spark, sfDir))
    time("q09 again")(graft.queries.Relational.distinctParts(spark, sfDir))
  }

  /** Round-20 optimization decompositions: where the warm seconds of
    * the top bench rows actually go (q131/q145 candidate-vs-DP split,
    * q191 stage split, the q66/q82/q157/q173 shared label loop). */
  private def r20(spark: SparkSession, sfDir: String): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    def time(label: String)(df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(df); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[r20] $label%-46s med ${ts(1)}%.3f  min ${ts.head}%.3f")
    }

    // ---- q131 decomposition (mirrors editDistanceNearDupsOver) ----
    val docs = Tables.documents(spark, sfDir)
    val alphabet = ('a' to 'z') ++ ('0' to '9') :+ ' '
    def bagCols(prefix: String): Seq[org.apache.spark.sql.Column] =
      alphabet.zipWithIndex.map { case (ch, i) =>
        (length($"text") - length(translate($"text", ch.toString, "")))
          .cast("int").as(s"$prefix$i")
      }
    val ascii = docs.filter(octet_length($"text") === length($"text"))
    val maxLen: Long = ascii
      .agg(coalesce(max(length($"text")), lit(0)).cast("long")).head().getLong(0)
    val maxDist: Int = math.max(1L, maxLen / 10).toInt
    val bandW: Long = math.max(64L, maxDist + 1L)
    val d = ascii
      .select(Seq($"doc_id", $"lang", $"text",
        length($"text").cast("long").as("len"),
        expr(s"length(text) div $bandW").as("band")) ++ bagCols("bag"): _*)
      .repartition(spark.sparkContext.defaultParallelism)
    val aBags = alphabet.indices.map(i => col(s"bag$i").as(s"a$i"))
    val bBags = alphabet.indices.map(i => col(s"bag$i").as(s"b$i"))
    val build = d.select(Seq($"doc_id".as("doc_a"), $"lang",
      $"text".as("text_a"), $"len".as("len_a"), $"band".as("key")) ++ aBags: _*)
    val probe = d.select(Seq($"doc_id".as("doc_b"), $"lang",
      $"text".as("text_b"), $"len".as("len_b"),
      explode(array($"band" - 1, $"band", $"band" + 1)).as("key")) ++ bBags: _*)
    val l1 = alphabet.indices.map(i => abs(col(s"a$i") - col(s"b$i"))).reduce(_ + _)
    val joined = build.join(probe, Seq("lang", "key"))
      .filter($"doc_a" < $"doc_b" &&
        abs($"len_a" - $"len_b") * 10 <= least($"len_a", $"len_b"))
    val survivors = joined
      .filter(l1 * 5 <= least($"len_a", $"len_b"))
      .select($"doc_a", $"doc_b", $"text_a", $"text_b", $"len_a", $"len_b")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_a"), col("doc_b"))
    println("[r20] q131 raw block pairs  = " + joined.select($"doc_a").count())
    println("[r20] q131 survivor pairs   = " + survivors.count())
    time("q131 d projection")(d)
    time("q131 join+len filter (no L1)")(
      joined.select($"doc_a", $"doc_b", $"len_a", $"len_b"))
    time("q131 join+L1 survivors (ids only)")(
      survivors.select($"doc_a", $"doc_b"))
    time("q131 survivors + texts")(survivors)
    time("q131 + DP at corpus maxDist")(survivors
      .withColumn("dist", levenshtein($"text_a", $"text_b", maxDist).cast("long"))
      .filter($"dist" >= 0 && $"dist" * 10 <= least($"len_a", $"len_b")))
    time("q131 + DP at per-pair band")(survivors
      .withColumn("dist", expr("levenshtein(text_a, text_b, " +
        "cast(greatest(1L, least(len_a, len_b) div 10) as int))").cast("long"))
      .filter($"dist" >= 0 && $"dist" * 10 <= least($"len_a", $"len_b")))

    // ---- q191 decomposition (mirrors retrievalEval) ----
    val truthSrc = graft.queries.TrainQueries.decontamPairsOver(docs)
    time("q191 truth (decontam pairs)")(truthSrc)
    val train = docs.filter($"source" =!= "src0")
    val toksD = train.select($"doc_id", split(trim($"text"), "\\s+").as("toks"))
    val dfT = toksD
      .select($"doc_id", explode(array_distinct($"toks")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("df"))
    time("q191 dfT (term df agg)")(dfT)
    val evalToks = docs.filter($"source" === "src0")
      .select($"doc_id".as("eval_id"),
        explode(array_distinct(split(trim($"text"), "\\s+"))).as("term"))
    val wQ = Window.partitionBy($"eval_id").orderBy($"df".asc, $"term".asc)
    val qtermsPlan = evalToks.join(dfT, "term")
      .withColumn("rn", row_number().over(wQ)).filter($"rn" <= 8)
      .select($"eval_id", $"term", $"df")
    time("q191 qterms (df join + window)")(qtermsPlan)
    time("q191 full")(graft.queries.TextQueries.retrievalEval(spark, sfDir))

    // ---- label-loop family ----
    time("q42 raw pairs (edges)")(graft.queries.DedupQueries
      .ngramJaccardPairsRaw(spark, sfDir).select($"id_a", $"id_b"))
    time("q66 labels (component loop)")(
      graft.queries.DedupQueries.clusterLabels(spark, sfDir))
    time("q66 full")(graft.queries.DedupQueries.dedupClusters(spark, sfDir))
    time("q173 full")(graft.queries.DedupQueries.canonicalKeepers(spark, sfDir))
    time("q157 full")(graft.queries.TrainQueries.clusterSplit(spark, sfDir))
  }

  /** Per-action scheduling-floor probes (median-of-7). */
  private def floor(spark: SparkSession, sfDir: String): Unit = {
    import spark.implicits._
    def med7(label: String)(f: => Unit): Unit = {
      val ts = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[fp] $label%-46s median ${ts(3)}%.3f  min ${ts.head}%.3f")
    }
    println("[fp] events rows = " + Tables.events(spark, sfDir).count())
    med7("events scan+filter errors (noop)") {
      noop(Tables.events(spark, sfDir).filter($"event_type" === "error")
        .select($"event_id", $"user_id", $"ts"))
    }
    med7("errors + clicks scans (noop, union)") {
      val ev = Tables.events(spark, sfDir)
      noop(ev.filter($"event_type" === "error")
        .select($"event_id", $"user_id", unix_micros($"ts").as("t"))
        .unionByName(ev.filter($"event_type" === "click")
          .select($"event_id", $"user_id", unix_micros($"ts").as("t"))))
    }
    med7("errors sorted output only (sort floor)") {
      noop(Tables.events(spark, sfDir).filter($"event_type" === "error")
        .select($"event_id", $"user_id",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"))
        .orderBy($"event_id"))
    }
  }
}
