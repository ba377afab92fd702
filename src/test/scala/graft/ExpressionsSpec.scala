package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions._
import graft.queries.{DedupQueries, SimilarityQueries}

/** Custom Catalyst expression correctness: cosine (codegen), minhash
  * (jaccard estimation), simhash (hamming locality) + LSH recall. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_similarity matches a hand-computed value (codegen path)") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val got = df.select(cosine_similarity(col("a"), col("b"))).as[Double].head()
    val exp = (4.0 + 10.0 + 18.0) / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got - exp) < 1e-12)
  }

  test("cosine_similarity: identical → 1, orthogonal → 0, zero-norm → null") {
    val df = Seq(
      (Array(1.0, 0.0), Array(1.0, 0.0)),
      (Array(1.0, 0.0), Array(0.0, 1.0)),
      (Array(0.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
    val got = df.select(cosine_similarity(col("a"), col("b")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(math.abs(got(0).get - 1.0) < 1e-12)
    assert(math.abs(got(1).get) < 1e-12)
    assert(got(2).isEmpty)
  }

  test("minhash signature estimates jaccard within tolerance") {
    val a = (1 to 100).map(i => s"tok$i")
    val b = (41 to 140).map(i => s"tok$i") // |∩|=60, |∪|=140 → J≈0.4286
    val df = Seq((a, b)).toDF("a", "b")
    val Array(sigA, sigB) = df.select(
        minhash_signature(col("a"), k = 128, seed = 7),
        minhash_signature(col("b"), k = 128, seed = 7))
      .collect().head match {
        case r => Array(r.getSeq[Long](0), r.getSeq[Long](1))
      }
    val est = sigA.zip(sigB).count { case (x, y) => x == y }.toDouble / sigA.size
    assert(math.abs(est - 60.0 / 140.0) < 0.15, s"estimate $est too far from 0.4286")
  }

  test("simhash: near-identical docs have small hamming distance, disjoint docs large") {
    val docA = (1 to 200).map(i => s"w$i")
    val docB = (1 to 200).map(i => if (i == 5) "CHANGED" else s"w$i") // 1 token differs
    val docC = (1000 to 1200).map(i => s"z$i")
    val df = Seq((docA, docB, docC)).toDF("a", "b", "c")
    val r = df.select(simhash64(col("a")), simhash64(col("b")), simhash64(col("c"))).collect().head
    val (ha, hb, hc) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(java.lang.Long.bitCount(ha ^ hb) <= 6, "near-dup should be close in hamming")
    assert(java.lang.Long.bitCount(ha ^ hc) >= 20, "unrelated should be far in hamming")
  }

  test("minhash LSH pairs recall vs exact jaccard (sf0.001, threshold 0.5)") {
    val exact = DedupQueries.ngramJaccardPairs(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = DedupQueries.minhashPairs(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the exact query is window-blocked; LSH is global — LSH must
    // recover nearly all blocked-window pairs (16 bands × 4 rows
    // s-curve: P(candidate) ≈ 1-(1-J^4)^16 ≥ 0.995 at J=0.5... only ≥0.93
    // at J≈0.6; allow 5% miss at the 0.5 boundary)
    val recovered = exact.intersect(lsh).size.toDouble
    assert(exact.isEmpty || recovered / exact.size >= 0.9,
      s"LSH recall too low: ${recovered.toInt}/${exact.size}")
  }

  test("ANN LSH returns sane neighbors (bucket-mates, ranked by cosine)") {
    val out = SimilarityQueries.annLsh(spark, sf).collect()
    assert(out.nonEmpty, "ANN should find some bucket-mates")
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val cosines = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cosines.sameElements(cosines.sortBy(-(_: Double))), "ranks must follow cosine desc")
    }
  }
}
