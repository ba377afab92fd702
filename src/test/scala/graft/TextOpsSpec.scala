package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** C1 clean_text semantics + fingerprint/token ops (SURVEY §5.1/§5.3). */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("t").select(TextQueries.cleanText(col("t"))).as[String].head()

  test("clean_text removes every 'RT @' occurrence (str.replace semantics)") {
    assert(clean("RT @user: hello RT @other world") == "user: hello other world")
  }

  test("clean_text collapses whitespace runs and trims") {
    assert(clean("  a \t b\n\n c  ") == "a b c")
    assert(clean("") == "")
    assert(clean("   ") == "")
  }

  test("clean_text is idempotent") {
    val samples = Seq("RT @x:  a  b ", "plain", "  RT @RT @y z ", "\t\n", "ünïcode  té xt")
    samples.foreach { s => assert(clean(clean(s)) == clean(s), s"not idempotent on '$s'") }
  }

  test("tokenCount counts whitespace-delimited tokens") {
    val n = Seq("one two  three\tfour").toDF("t")
      .select(TextQueries.tokenCount(col("t"))).as[Long].head()
    assert(n == 4)
  }

  test("fingerprint matches the char-level rolling hash definition") {
    // fold over codepoints: acc*31 + cp mod 1e9+7; 'hello world' → 204910434
    // (pinned against the DuckDB oracle's list_reduce computation)
    val fp = Seq("hello world").toDF("t")
      .select(TextQueries.fingerprint(col("t"))).as[Long].head()
    assert(fp == 204910434L)
  }

  test("fingerprint is deterministic and collision-distinct on fixture docs") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val nFp = docs.select(TextQueries.fingerprint(col("text"))).distinct().count()
    // 500 distinct texts at sf0.001 → expect no collisions at this scale
    assert(nFp == n, s"unexpected fingerprint collisions: $nFp of $n")
  }
}
