package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew- and shuffle-management utilities (the 100 TB toolbox the
  * fixture scale can't exercise for real but whose plan shapes are
  * asserted in ScaleSpec):
  *
  *  - AQE's skew-join splitting handles sort-merge join skew at
  *    runtime (on by default); salting remains the tool for skewed
  *    AGGREGATIONS and for broadcast-averse hot-key joins.
  *  - Bucketed tables co-locate both sides of a frequent equi-join at
  *    write time: the join then plans with zero Exchange.
  */
object Scale {

  /** Two-phase salted aggregation: count/sum-like aggs over a key
    * whose distribution is heavily skewed. Phase 1 spreads each hot
    * key across `salt` reducers ((key, salt) partial agg), phase 2
    * merges the partials per key. Identical result to a direct
    * groupBy; the first shuffle is balanced even if one key owns 90%
    * of rows. */
  def saltedCount(df: DataFrame, key: Column, salt: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col("key"))
      .agg(sum("_partial").as("cnt"))

  /** Salted equi-join of a skewed fact side against a small-ish dim
    * that is still too large (or too row-multiplying) to broadcast:
    * fact rows get a per-row salt in [0, salt); the dim side is
    * replicated `salt` ways; the join key becomes (key, salt) so one
    * hot key spreads over `salt` reducers. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)).cast("int"))
    val replicatedDim = dim.withColumn("_salt", explode(lit((0 until salt).toArray)))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Bucketed write: co-locates (and co-sorts) a table on its join
    * key so repeated equi-joins/aggregations on that key plan with no
    * Exchange. The write shuffles once; every subsequent join reads
    * pre-partitioned data. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
