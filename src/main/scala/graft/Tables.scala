package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated fixture tables
  * (see TESTDATA.md / FIXTURES.md §2). One method per table so query
  * code reads declaratively; column pruning + filter pushdown reach
  * the parquet scan because these are plain `spark.read.parquet`
  * relations (no caching, no collect).
  *
  * At cluster scale the same loaders work unchanged: paths become
  * object-store URIs and Catalyst handles partition discovery.
  */
object Tables {
  /** Parquet schema cache keyed by file path. Footer-based schema
    * inference costs a synchronous driver-side read per `spark.read
    * .parquet` call; across a 51-query bench that is seconds of pure
    * overhead. Schemas are a property of the files, not the session,
    * so a path-keyed cache is safe (fixture dirs are immutable) and
    * leaks nothing. File listing itself is already cached by Spark's
    * shared FileStatusCache. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  private def load(s: SparkSession, path: String): DataFrame = {
    val schema = schemaCache.computeIfAbsent(path, p => s.read.parquet(p).schema)
    s.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, dir: String): DataFrame    = load(s, s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame    = load(s, s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame  = load(s, s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame  = load(s, s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame      = load(s, s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame    = load(s, s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame  = load(s, s"$dir/lineitem.parquet")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy conf, runtime-settable)
    * and floor-divide to micros — identical to DuckDB's ns→TIMESTAMP
    * truncation, so oracle comparisons agree. */
  def events(s: SparkSession, dir: String): DataFrame = {
    // Prefer setting this at session build time (Bench/Verify do); the
    // runtime set here is an idempotent fallback (only ever flips
    // false→true, so it cannot race a concurrent reader into a
    // different schema mid-query).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, s"$dir/embeddings.parquet")
}
