package graft

import org.apache.spark.sql.functions._

/** q63 and q74 are the suite's two declared no-oracle rows (their
  * estimates/answers are sketch- and centroid-dependent, not
  * SQL-reproducible — the harness records `spark_rows` without
  * comparing). "No oracle" must not mean "unasserted": these specs
  * pin the exact row count, schema, and the structural invariants the
  * production consumer relies on, so shape drift fails loudly even
  * though no hash comparison runs. The underlying ALGORITHM guarantees
  * are pinned separately by the oracle-matched validated siblings
  * (q57 for the Misra–Gries estimates, q58 for the IVF index). */
class NoOracleShapeSpec extends SparkSpec {
  import spark.implicits._

  test("q63 heavy-hitters top: exactly 5 ranked rows per type, est desc, capacity bound") {
    val df = SparkEntry.queries("q63_heavy_hitters_top")(spark, sf)
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      ("event_type", "string"), ("rank", "int"), ("item", "string"), ("est", "bigint")),
      s"schema drifted: ${df.schema.simpleString}")
    val rows = df.collect()
    val nTypes = Tables.events(spark, sf).select($"event_type").distinct().count()
    assert(rows.length == 5 * nTypes,
      s"expected 5 rows per type * $nTypes types, got ${rows.length}")
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to 5),
        s"$t: ranks must be exactly 1..5")
      val ests = rs.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(ests.sameElements(ests.sortBy(-(_: Long))),
        s"$t: estimates must be nonincreasing in rank")
      assert(ests.forall(_ > 0), s"$t: a tracked item's estimate is positive")
    }
  }

  test("q74 IVF top-k: one answer per vector, no self-match, cosine in range") {
    val df = SparkEntry.queries("q74_ivf_topk")(spark, sf)
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      ("id_a", "bigint"), ("nearest_id", "bigint"), ("cosine", "double"), ("cell", "int")),
      s"schema drifted: ${df.schema.simpleString}")
    val rows = df.collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(rows.length == nVecs, s"every vector answers once: ${rows.length} != $nVecs")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "id_a must be unique (one NN per vector)")
    rows.foreach { r =>
      assert(r.getLong(0) != r.getLong(1), s"vector ${r.getLong(0)} matched itself")
      val c = r.getDouble(2)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"cosine $c out of range")
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 16, s"cell ${r.getInt(3)} outside [1, k]")
    }
  }
}
