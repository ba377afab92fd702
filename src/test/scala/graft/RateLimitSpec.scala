package graft

import graft.streaming.{RateLimit, TokenBucket}

/** Feeder-side rate control (SURVEY §2.1 S1: the reference producer's
  * poll cadence + 429 backoff, twitter_producer.py:95-111). All tests
  * run on a virtual clock — no sleeping. */
class RateLimitSpec extends SparkSpec {

  private def virtualClock(startMs: Long = 0L): (() => Long, Long => Unit) = {
    var now = startMs
    (() => now, (ms: Long) => now += ms)
  }

  test("token bucket: burst up to capacity, then refill-rate bound") {
    val (clock, advance) = virtualClock()
    val b = new TokenBucket(capacity = 3, refillPerSec = 2, clock)
    // burst drains the full capacity instantly
    assert(b.tryAcquire() && b.tryAcquire() && b.tryAcquire())
    assert(!b.tryAcquire(), "bucket must be empty after the burst")
    // at 2 tokens/sec the next token is 500 ms away
    assert(b.delayMs() === 500L)
    advance(499); assert(!b.tryAcquire())
    advance(1); assert(b.tryAcquire())
    // tokens cap at capacity: a long idle period doesn't overfill
    advance(60000)
    assert(b.delayMs(4) > 0, "capacity 3 bucket can never admit a 4-token burst")
    assert(b.tryAcquire(3) && !b.tryAcquire())
  }

  test("429 backoff math matches the reference (reset - now + 60s, never negative)") {
    // twitter_producer.py:98-106: wait_time = reset - now + 60
    assert(RateLimit.backoffMs(resetEpochSec = 1000, nowSec = 940) === 120000L)
    assert(RateLimit.backoffMs(resetEpochSec = 1000, nowSec = 1000) === 60000L)
    // a reset far in the past (stale header) still never goes negative
    assert(RateLimit.backoffMs(resetEpochSec = 100, nowSec = 1000) === 0L)
    assert(RateLimit.backoffMs(resetEpochSec = 100, nowSec = 1000, padSec = 0) === 0L)
  }

  test("throttledFeed paces batches by the bucket and spools atomically-named files") {
    val (clock, advance) = virtualClock()
    val bucket = new TokenBucket(capacity = 1, refillPerSec = 1, clock)
    val dir = java.nio.file.Files.createTempDirectory("graft-spool")
    var throttledMs = 0L
    val batches = Iterator(
      Seq("""{"data":{"id":"1","text":"a"}}"""),
      Seq("""{"data":{"id":"2","text":"b"}}"""),
      Seq("""{"data":{"id":"3","text":"c"}}"""))
    val files = RateLimit.throttledFeed(batches, dir, bucket,
      onThrottle = ms => { throttledMs += ms; advance(ms) })
    // batch 1 rides the initial burst token; 2 and 3 each wait ~1s
    assert(files.size === 3)
    assert(throttledMs >= 2000L && throttledMs <= 2100L,
      s"expected ~2s of throttling for 3 batches at 1/s, got $throttledMs ms")
    assert(files.forall(f => f.getFileName.toString.matches("batch\\d{5}\\.jsonl")))
    // no temp files left behind; spool dir is clean for the tailer
    val leftovers = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"temp files visible to the file source: ${leftovers.mkString}")

    // and the spool is exactly what jsonFileSource tails: batch-read it back
    val read = spark.read.text(dir.toString).count()
    assert(read === 3)
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
  test("end-to-end: throttled spool files stream through jsonFileSource in bounded triggers") {
    val (clock, advance) = virtualClock()
    val bucket = new TokenBucket(capacity = 1, refillPerSec = 10, clock)
    val dir = java.nio.file.Files.createTempDirectory("graft-spool-e2e")
    val batches = (1 to 3).map(i => Seq(s"""{"data":{"id":"$i","text":"t$i"}}""")).iterator
    RateLimit.throttledFeed(batches, dir, bucket, onThrottle = advance)

    // the streaming half of S1: tail the spool with per-trigger intake
    // bounded to one file (the file-source backpressure knob)
    val src = graft.streaming.Pipeline.jsonFileSource(spark, dir.toString,
      maxFilesPerTrigger = Some(1))
    val q = src.writeStream.format("memory").queryName("rate_e2e")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-spool-ckpt").toString)
      .start()
    q.awaitTermination(60000)
    val rows = spark.sql("SELECT * FROM rate_e2e").collect()
    assert(rows.length === 3, s"all three spooled batches must arrive, got ${rows.length}")
    // maxFilesPerTrigger=1 over 3 files => at least 3 micro-batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
      s"expected >=3 non-empty micro-batches, got ${q.recentProgress.map(_.numInputRows).mkString(",")}")
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
