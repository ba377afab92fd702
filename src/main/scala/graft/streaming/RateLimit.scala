package graft.streaming

/** Feeder-side rate control (SURVEY §2.1, S1): the reference's
  * producer throttles itself against the Twitter API — a fixed poll
  * cadence, and on HTTP 429 it reads `x-rate-limit-reset` and sleeps
  * `reset - now + 60` seconds before retrying
  * (twitter_producer.py:95-111). In the Spark re-expression the
  * FEEDER is a driver program outside the streaming graph (SURVEY
  * declares the poll loop a driver-program concern), and the graph's
  * own backpressure knob is `maxFilesPerTrigger` /
  * `maxOffsetsPerTrigger` on the source. This file supplies the
  * feeder half so the semantics are demonstrated, not just declared:
  *
  *  - [[TokenBucket]] — classic token-bucket admission (capacity =
  *    burst, refill = steady-state rate), the general form of the
  *    reference's fixed poll interval. Pure arithmetic over an
  *    injected clock: unit-testable without sleeping.
  *  - [[RateLimit.backoffMs]] — the reference's 429 math verbatim
  *    (wait until the advertised reset, plus a 60 s safety pad,
  *    never negative).
  *  - [[RateLimit.throttledFeed]] — drives a sequence of payload
  *    batches into a spool directory at the bucket's rate (each
  *    batch becomes one atomically-renamed file, the shape
  *    [[Pipeline.jsonFileSource]] tails), honoring backoff signals
  *    between batches.
  */
final class TokenBucket(capacity: Double, refillPerSec: Double,
    clock: () => Long) {
  require(capacity > 0 && refillPerSec > 0, "capacity and refill rate must be positive")

  private[this] var tokens: Double = capacity
  private[this] var lastMs: Long = clock()

  private def refill(): Unit = {
    val now = clock()
    if (now > lastMs) {
      tokens = math.min(capacity, tokens + (now - lastMs) / 1000.0 * refillPerSec)
      lastMs = now
    }
  }

  /** Take `n` tokens if available right now. */
  def tryAcquire(n: Double = 1.0): Boolean = synchronized {
    refill()
    if (tokens >= n) { tokens -= n; true } else false
  }

  /** Milliseconds until `n` tokens will be available (0 if they
    * already are). Callers sleep this long and then [[tryAcquire]];
    * the two-step form keeps the class clock-pure. */
  def delayMs(n: Double = 1.0): Long = synchronized {
    refill()
    if (tokens >= n) 0L
    else math.ceil((n - tokens) / refillPerSec * 1000.0).toLong
  }
}

object RateLimit {

  /** The reference's 429 handling as arithmetic
    * (twitter_producer.py:98-106): wait from `nowSec` until the
    * advertised `resetEpochSec`, plus a 60 s pad; a reset already in
    * the past means no wait. Returns milliseconds. */
  def backoffMs(resetEpochSec: Long, nowSec: Long, padSec: Long = 60L): Long =
    math.max(0L, resetEpochSec - nowSec + padSec) * 1000L

  /** Drive `batches` of JSONL lines into `spoolDir` at the bucket's
    * rate — the feeder loop the reference runs against the Twitter
    * API, pointed at the file source instead. One batch = one spool
    * file, written to a temp name and atomically renamed so the
    * streaming file source never observes a partial file.
    * `onThrottle` observes every pre-batch wait (tests inject a
    * virtual sleep; production passes `Thread.sleep`). Returns the
    * files written. */
  def throttledFeed(batches: Iterator[Seq[String]], spoolDir: java.nio.file.Path,
      bucket: TokenBucket, onThrottle: Long => Unit): Seq[java.nio.file.Path] = {
    val out = Seq.newBuilder[java.nio.file.Path]
    var i = 0
    batches.foreach { lines =>
      var wait = bucket.delayMs()
      while (!bucket.tryAcquire()) {
        onThrottle(math.max(wait, 1L))
        wait = bucket.delayMs()
      }
      val tmp = spoolDir.resolve(f"_batch$i%05d.jsonl.tmp")
      val fin = spoolDir.resolve(f"batch$i%05d.jsonl")
      java.nio.file.Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, fin,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      out += fin
      i += 1
    }
    out.result()
  }
}
