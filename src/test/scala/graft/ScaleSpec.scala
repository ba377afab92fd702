package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

/** Plan-shape assertions for the scale toolbox: salted results are
  * exact; bucketed joins plan with zero Exchange. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedCount is exact vs direct groupBy on skewed data") {
    // 90% of rows under one key; id is the deterministic salt source
    val df = spark.range(100000)
      .select($"id", when($"id" % 10 =!= 0, lit(0L)).otherwise($"id").as("k"))
    val direct = df.groupBy($"k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedCount(df, $"k", saltBy = $"id", salt = 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == direct)
    // the hot key really spreads: its rows land on >1 salt value
    val spread = df.filter($"k" === 0L)
      .select(pmod(hash($"id"), lit(16)).as("s")).distinct().count()
    assert(spread > 1)
  }

  test("saltedJoin is exact vs direct join") {
    val fact = spark.range(20000)
      .select(when($"id" % 5 =!= 0, lit(1L)).otherwise($"id" % 100).as("k"), $"id".as("v"))
    val dim = spark.range(100).select($"id".as("k"), concat(lit("d"), $"id").as("name"))
    val direct = fact.join(dim, "k").agg(count(lit(1)), sum($"v")).head()
    val salted = Scale.saltedJoin(fact, dim, "k", saltBy = $"v", salt = 8)
      .agg(count(lit(1)), sum($"v")).head()
    assert(direct == salted)
  }

  test("AQE skew join: OptimizeSkewedJoin splits the hot key at runtime (no manual salt)") {
    // The first knob a 100 TB operator reaches for on a skewed
    // SHUFFLE JOIN is not saltedJoin — it is Spark's own runtime
    // skew-split, on by default. This pins that the default actually
    // fires on a hot-key sort-merge join (thresholds scaled down to
    // fixture bytes; the PRODUCTION defaults are 256 MB / factor 5),
    // so MIGRATION.md's salt-vs-AQE decision rule rests on an
    // asserted behavior, not folklore.
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50k")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // ~2.5 MB of key-0 rows land in ONE of the 4 shuffle partitions
      // while the 1..1000 tail keeps the median partition tiny. The
      // payload must SURVIVE the shuffle (aggregated below, else
      // column pruning drops it pre-exchange and nothing is skewed)
      // and be incompressible (sha2, not a constant — shuffle sizes
      // are compressed bytes).
      val pad = sha2(concat(lit("p"), $"id".cast("string")), 256)
      val fact = spark.range(40000).select(lit(0L).as("key"), pad.as("pad"))
        .union(spark.range(4000).select(($"id" % 1000 + 1).as("key"), pad.as("pad")))
      val dim = spark.range(0, 1001).select($"id".as("key"), ($"id" * 2).as("v"))
      val q = fact.join(dim, "key")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"), sum(length($"pad")).as("sp"))
      val Array(row) = q.collect()
      assert(row.getLong(0) == 44000L, s"join result wrong: $row")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin(skew=true)") && plan.contains("AQEShuffleRead skewed"),
        s"OptimizeSkewedJoin did not fire (no skew-split markers in the final plan):\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("oracleTierGuard refuses quadratic oracle queries past the row cap") {
    spark.conf.set("spark.graft.oracleTier.maxRows", "10")
    try {
      val e = intercept[IllegalArgumentException] {
        graft.queries.SimilarityQueries.nnWithinLabel(spark, sf)
      }
      assert(e.getMessage.contains("q55_nn_lsh"))
    } finally spark.conf.unset("spark.graft.oracleTier.maxRows")
    // under the default cap the oracle-tier form still runs
    assert(graft.queries.SimilarityQueries.nnWithinLabel(spark, sf).limit(1).count() === 1)
  }

  test("q131 exact edit-distance form is oracle-tier gated (VERDICT r15 #2)") {
    spark.conf.set("spark.graft.oracleTier.maxRows", "10")
    try {
      val e = intercept[IllegalArgumentException] {
        graft.queries.DedupQueries.editDistanceNearDups(spark, sf)
      }
      assert(e.getMessage.contains("q44_simhash_pairs"))
    } finally spark.conf.unset("spark.graft.oracleTier.maxRows")
    assert(graft.queries.DedupQueries.editDistanceNearDups(spark, sf)
      .limit(1).count() === 1)
  }

  test("bucketed tables join with zero Exchange") {
    val priorThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Scale.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey", 8)
      Scale.writeBucketed(
        Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", 8)
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan
      // with AQE the final plan nests; scan the rendered tree for any
      // Exchange (shuffle or broadcast) node
      val allExchanges = plan.toString.split("\n").count(_.contains("Exchange"))
      assert(allExchanges == 0, s"expected shuffle-free bucketed join, plan:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("interleaveBits: Morton code interleaves correctly") {
    import org.apache.spark.sql.functions.col
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (0xffffffffL, 0L), (2L, 3L))
      .toDF("a", "b")
      .select(Scale.interleaveBits(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    // bit i of a → position 2i; bit i of b → position 2i+1
    assert(got == Seq(0L, 1L, 2L, 3L, 0x5555555555555555L, 0xEL), s"got $got")
  }

  test("z-order write: every file covers a compact range of BOTH columns") {
    import org.apache.spark.sql.functions._
    // a 2-D grid where the two columns are independent — the
    // adversarial case for any single-column sort
    val n = 40000
    val grid = spark.range(n).select(
      (col("id") % 200).as("x"),
      (col("id") / 200).cast("long").as("y"))
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString

    def meanSpanFraction(path: String, c: String, domain: Double): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(((max(col(c)) - min(col(c))).cast("double") / domain).as("span"))
        .select(avg(col("span"))).head().getDouble(0)
      spans
    }

    // linear sort on x: files are perfect on x, full-domain on y
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/linear")
    // z-order on (x, y)
    Scale.zorderWrite(grid, "x", "y", s"$base/zorder", files = 16)

    val linearY = meanSpanFraction(s"$base/linear", "y", 200.0)
    val zX = meanSpanFraction(s"$base/zorder", "x", 200.0)
    val zY = meanSpanFraction(s"$base/zorder", "y", 200.0)
    // the linear layout cannot skip on y at all (each file spans ~the
    // whole y domain); the z-order layout must bound BOTH dimensions
    assert(linearY > 0.9, s"sanity: linear-x files should span y, got $linearY")
    // expected mean span ≈ 0.35–0.45; 0.7 leaves headroom for the
    // sample-based RangePartitioner landing file boundaries across
    // z-quadrant edges (whose bounding boxes are wider)
    assert(zX < 0.7 && zY < 0.7,
      s"z-order files must cover compact rectangles: x-span $zX, y-span $zY")

    // pruned-files metric (the q64 shape): count the files whose
    // (min,max) envelope overlaps a predicate — the files a
    // stats-aware scanner (parquet row-group stats, Delta/Iceberg
    // file stats) actually reads. Z-order's contract is WORKLOAD
    // symmetry: a linear-x layout prunes x-predicates perfectly but
    // reads EVERY file for a y-only predicate; z-order prunes on
    // either dimension. (For a small two-sided box a per-dim linear
    // sort can beat z-order on its own dimension — that is the
    // documented trade, not a regression.)
    def overlappingFiles(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
          min(col("y")).as("y0"), max(col("y")).as("y1"))
        .filter(pred)
        .count()
    val yBox = col("y1") >= 40 && col("y0") <= 45
    val bothBox = col("x1") >= 40 && col("x0") <= 45 && yBox
    val linearYOnly = overlappingFiles(s"$base/linear", yBox)
    val zorderYOnly = overlappingFiles(s"$base/zorder", yBox)
    val zorderBoth = overlappingFiles(s"$base/zorder", bothBox)
    assert(linearYOnly === 16,
      s"sanity: the linear-x layout cannot prune a y-only predicate, got $linearYOnly of 16")
    assert(zorderYOnly <= 8,
      s"z-order must prune a y-only ~3% predicate to at most half the files, " +
        s"got $zorderYOnly of 16")
    assert(zorderBoth <= zorderYOnly,
      s"adding the x side must not read MORE files: $zorderBoth vs $zorderYOnly")
  }
  test("reliableCheckpoint: default (no conf) truncates lineage via localCheckpoint") {
    val df = spark.range(1000).selectExpr("id", "id % 7 AS k")
      .groupBy("k").count()
    val ck = Scale.checkpointed(df)
    // lineage truncated: the checkpointed frame's optimized plan is a
    // bare RDD scan, no aggregate/exchange ancestry left to replay
    val plan = ck.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("Scan ExistingRDD"),
      s"expected lineage-truncating scan, got:\n$plan")
    assert(!plan.contains("Aggregate"), s"ancestry survived the checkpoint:\n$plan")
    assert(ck.count() === 7)
  }

  test("reliableCheckpoint: spark.graft.checkpoint.dir switches to reliable checkpoint files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set("spark.graft.checkpoint.dir", dir)
    try {
      val df = spark.range(500).selectExpr("id", "id % 3 AS k").groupBy("k").count()
      val ck = Scale.checkpointed(df)
      val plan = ck.queryExecution.optimizedPlan.toString
      assert(plan.contains("LogicalRDD") || plan.contains("Scan ExistingRDD"),
        s"expected lineage-truncating scan, got:\n$plan")
      assert(ck.count() === 3)
      // RELIABLE semantics: blocks live as files under the conf'd dir
      // (this is what survives executor loss — localCheckpoint leaves
      // nothing here)
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"no checkpoint files written under $dir")
      // identical results through either materialization
      val local = df.localCheckpoint()
      assert(ck.orderBy("k").collect().toSeq === local.orderBy("k").collect().toSeq)
    } finally {
      spark.conf.unset("spark.graft.checkpoint.dir")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("reliableCheckpoint: a CHANGED spark.graft.checkpoint.dir re-applies (not first-wins)") {
    val dirA = java.nio.file.Files.createTempDirectory("graft-ckpt-a").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-ckpt-b").toString
    def filesUnder(d: String): Long =
      java.nio.file.Files.walk(java.nio.file.Paths.get(d))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
    try {
      spark.conf.set("spark.graft.checkpoint.dir", dirA)
      Scale.checkpointed(spark.range(100).toDF()).count()
      assert(filesUnder(dirA) > 0, s"first checkpoint must land under $dirA")
      // the round-9 bug: the context kept dirA forever, so a session
      // that moved the conf (e.g. after cleaning dirA) silently kept
      // writing into the retired directory
      spark.conf.set("spark.graft.checkpoint.dir", dirB)
      Scale.checkpointed(spark.range(100).toDF()).count()
      assert(filesUnder(dirB) > 0, s"changed conf must redirect checkpoints to $dirB")
      // ADVICE r10: getCheckpointDir returns the QUALIFIED UUID
      // subdirectory, so the old prefix test never matched and every
      // call minted a fresh UUID dir — an UNCHANGED conf must reuse
      // the one already applied
      Scale.checkpointed(spark.range(100).toDF()).count()
      val uuidDirs = java.nio.file.Files.list(java.nio.file.Paths.get(dirB)).count()
      assert(uuidDirs == 1L,
        s"unchanged conf re-applied setCheckpointDir ($uuidDirs UUID dirs under $dirB)")
      // ADVICE r11: the tracked value is JVM-global but the dir lives
      // on the SparkContext — after an EXTERNAL setCheckpointDir (or a
      // context restart) an unchanged conf value must re-apply, not
      // silently checkpoint into someone else's directory
      spark.sparkContext.setCheckpointDir(dirA)
      Scale.checkpointed(spark.range(100).toDF()).count()
      assert(spark.sparkContext.getCheckpointDir.exists(_.contains(dirB)),
        s"external setCheckpointDir desynced the applied dir: " +
          s"${spark.sparkContext.getCheckpointDir} should be under $dirB")
    } finally {
      spark.conf.unset("spark.graft.checkpoint.dir")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dirA))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dirB))
    }
  }
}
