package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.expressions._

/** Similarity search over the `embeddings` fixture (north-star ANN
  * operator family).
  *
  * Baseline: brute-force cosine top-k via the codegen'd
  * [[graft.functions.CosineSimilarity]] expression — a broadcast of
  * the (small) query set against a full scan of the corpus: no
  * shuffle of the corpus at all; each partition emits its local
  * top-k via the row_number window, which Catalyst executes as a
  * partial sort bounded by k.
  *
  * Scale path: random-hyperplane LSH (`annLsh`) — deterministic
  * seeded projections bucket vectors by sign pattern; queries probe
  * only their own bucket. The corpus shuffles once on bucket id
  * (8 bytes/row), and per-bucket candidate lists are small. An IVF
  * variant would swap the hash for learned centroids; same plan
  * shape (bucket → shuffle → within-bucket re-rank).
  */
object SimilarityQueries {

  /** Brute-force cosine top-5 neighbors for query vectors vec_id<10. */
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
    e.select($"vec_id".as("neighbor_id"), $"embedding".as("n_emb"))
      .join(broadcast(q), $"neighbor_id" =!= $"query_id")
      .withColumn("cosine", round(cosine_similarity($"q_emb", $"n_emb"), 6))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"neighbor_id", $"cosine", $"rank")
      .orderBy($"query_id", $"rank")
  }

  val cosineTopKSql: String =
    """SELECT query_id, neighbor_id, cosine, rank FROM (
      |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]), 6) AS cosine,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]), 6) DESC,
      |               n.vec_id) AS rank
      |  FROM embeddings q JOIN embeddings n ON n.vec_id <> q.vec_id
      |  WHERE q.vec_id < 10)
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Exact nearest neighbor per vector within its label block
    * (blocked k-NN join — the verify pass of an IVF-style index where
    * `label` stands in for the coarse centroid assignment). */
  def nnWithinLabel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val a = e.select($"vec_id".as("id_a"), $"label", $"embedding".as("emb_a"))
    val b = e.select($"vec_id".as("id_b"), $"label", $"embedding".as("emb_b"))
    val w = Window.partitionBy($"id_a").orderBy($"cosine".desc, $"id_b")
    a.join(b, Seq("label"))
      .filter($"id_a" =!= $"id_b")
      .withColumn("cosine", round(cosine_similarity($"emb_a", $"emb_b"), 6))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"id_a", $"id_b".as("nearest_id"), $"cosine", $"label")
      .orderBy($"id_a")
  }

  val nnWithinLabelSql: String =
    """SELECT id_a, nearest_id, cosine, label FROM (
      |  SELECT a.vec_id AS id_a, b.vec_id AS nearest_id, a.label AS label,
      |    round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine,
      |    row_number() OVER (PARTITION BY a.vec_id
      |      ORDER BY round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) DESC,
      |               b.vec_id) AS rn
      |  FROM embeddings a JOIN embeddings b
      |    ON a.label = b.label AND a.vec_id <> b.vec_id)
      |WHERE rn = 1 ORDER BY id_a""".stripMargin

  /** Random-hyperplane LSH ANN: 8 seeded pseudo-hyperplanes → 256
    * sign buckets; top-3 neighbors within bucket. Hyperplane
    * component j of plane p is a deterministic hash-derived value in
    * [−1, 1] — reproducible across executors with no broadcast state.
    * Rows-only check (hash-seeded projections aren't SQL-expressible);
    * AnnSpec asserts recall vs brute force. */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val planes = 8
    // deterministic pseudo-random hyperplane components via murmur-mix
    def planeComponent(p: Int, j: Int): Double = {
      val h = scala.util.hashing.MurmurHash3.productHash((p, j), 42)
      (h.toDouble / Int.MaxValue)
    }
    val dim = 64
    val planeArrays = (0 until planes).map(p => (0 until dim).map(j => planeComponent(p, j)).toArray)
    val bucketOf = (emb: org.apache.spark.sql.Column) =>
      planeArrays.zipWithIndex.map { case (pa, p) =>
        val dot = aggregate(
          zip_with(array(pa.map(lit): _*), emb.cast("array<double>"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x)
        when(dot > 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"label", $"embedding", bucketOf($"embedding").as("bucket"))
    val a = e.select($"vec_id".as("query_id"), $"bucket", $"embedding".as("q_emb"))
      .filter($"query_id" < 10)
    val b = e.select($"vec_id".as("neighbor_id"), $"bucket", $"embedding".as("n_emb"))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
    a.join(b, Seq("bucket"))
      .filter($"query_id" =!= $"neighbor_id")
      .withColumn("cosine", round(cosine_similarity($"q_emb", $"n_emb"), 6))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"query_id", $"neighbor_id", $"cosine", $"rank", $"bucket")
      .orderBy($"query_id", $"rank")
  }

  /** Generator/explode surface (SURVEY §2.10 UDTF note): per-dimension
    * corpus statistics via posexplode of the embedding arrays —
    * the only array-typed fixture column. Map-side explode feeding a
    * 64-group aggregate; no wide shuffle (rows shrink to (dim, value)
    * pairs before the exchange). */
  def embeddingDimStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select(posexplode($"embedding"))
      .toDF("dim", "v")
      .groupBy(($"dim" + 1).cast("long").as("dim"))
      .agg(round(avg($"v".cast("double")), 6).as("avg_v"),
        round(min($"v".cast("double")), 6).as("min_v"),
        round(max($"v".cast("double")), 6).as("max_v"),
        count(lit(1)).as("n"))
      .orderBy($"dim")
  }

  val embeddingDimStatsSql: String =
    """SELECT i AS dim,
      |  round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS avg_v,
      |  round(min(CAST(embedding[i] AS DOUBLE)), 6) AS min_v,
      |  round(max(CAST(embedding[i] AS DOUBLE)), 6) AS max_v,
      |  count(*) AS n
      |FROM embeddings, range(1, 65) t(i)
      |GROUP BY i ORDER BY dim""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_embedding_dim_stats" -> (embeddingDimStats _),
    "q46_cosine_topk" -> (cosineTopK _),
    "q47_nn_within_label" -> (nnWithinLabel _),
    "q48_ann_lsh" -> (annLsh _),
  )

  val oracles: Map[String, String] = Map(
    "q46_cosine_topk" -> cosineTopKSql,
    "q47_nn_within_label" -> nnWithinLabelSql,
    "q49_embedding_dim_stats" -> embeddingDimStatsSql,
  )
}
