package graft

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries

/** PCA train/store/apply: the stored model round-trips exactly and the
  * apply step projects through it without refitting. */
class PcaModelSpec extends SparkSpec {
  import spark.implicits._

  test("stored model round-trips bit-exactly; apply step projects correctly") {
    val tbl = "pca_model_spec"
    SimilarityQueries.buildPcaModel(spark, sf, tbl)
    try {
      val (mean, comps) = SimilarityQueries.loadPcaModel(spark, tbl)
      assert(mean.length == 64 && comps.length == 8 && comps.forall(_.length == 64))
      // the fit is deterministic and doubles survive parquet exactly:
      // a second fresh fit must equal the stored model bit-for-bit
      val (mean2, comps2) = SimilarityQueries.fitPca(
        Tables.embeddings(spark, sf).select($"embedding").na.drop(), 8)
      assert(mean.sameElements(mean2), "stored mean must equal a fresh fit")
      comps.zip(comps2).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a.sameElements(b), s"stored component $i must equal a fresh fit")
      }
      // apply: every vector gets k coordinates; projecting through an
      // orthonormal basis never exceeds the centered norm
      val projected = SimilarityQueries.pcaProjected(spark, tbl,
        Tables.embeddings(spark, sf).select($"vec_id", $"embedding"))
      val rows = projected.select($"vec_id", $"z",
          aggregate(transform($"embedding",
            (x, i) => x.cast("double") - element_at(typedlit(mean.toSeq), i + 1)),
            lit(0.0), (acc, x) => acc + x * x).as("norm_sq"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val z = r.getSeq[Double](1)
        assert(z.length == 8, s"expected 8 coordinates, got ${z.length}")
        val projSq = z.map(v => v * v).sum
        assert(projSq <= r.getDouble(2) * 1.000001 + 1e-9,
          s"vec ${r.getLong(0)}: projection cannot exceed the centered norm")
      }
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
