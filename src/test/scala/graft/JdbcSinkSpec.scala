package graft

import java.sql.DriverManager
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.JdbcSink

/** K3 JDBC-backend parity (reference stores via INSERT OR IGNORE /
  * ON CONFLICT DO NOTHING): duplicate batches must not change the
  * table — the first writer of a key wins. Uses embedded Derby (the
  * JDBC database shipped with Spark's jars). */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-derby")
    System.setProperty("derby.system.home", d.toString)
    d.toString
  }
  private lazy val url = s"jdbc:derby:$dbDir/graftdb;create=true"

  private def withStatement[A](f: java.sql.Statement => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn.createStatement()) finally conn.close()
  }

  private def count(table: String): Long = withStatement { st =>
    val rs = st.executeQuery(s"SELECT count(*) FROM $table")
    rs.next(); rs.getLong(1)
  }

  test("insertIgnore: replaying a batch with duplicates leaves the table unchanged") {
    withStatement(_.execute(
      """CREATE TABLE tweets_ii (
        |  tweet_id VARCHAR(32) PRIMARY KEY,
        |  txt VARCHAR(256), score DOUBLE)""".stripMargin))
    val batch = Seq(
      ("t1", "hello", 0.5), ("t2", "world", -0.1), ("t3", "again", 0.9))
      .toDF("tweet_id", "txt", "score")
    JdbcSink.insertIgnore(batch, url, "tweets_ii")
    assert(count("tweets_ii") == 3)
    // replay the same batch plus one conflicting row for an existing key
    val replay = batch.union(Seq(("t1", "CHANGED", 9.9)).toDF("tweet_id", "txt", "score"))
    JdbcSink.insertIgnore(replay, url, "tweets_ii")
    assert(count("tweets_ii") == 3, "duplicate keys must be ignored, not inserted")
    val first = withStatement { st =>
      val rs = st.executeQuery("SELECT txt FROM tweets_ii WHERE tweet_id = 't1'")
      rs.next(); rs.getString(1)
    }
    assert(first == "hello", "first writer wins — conflicting update must be a no-op")
  }

  test("insertIgnore quotes irregular identifiers (spaces, case) safely") {
    // DDL with QUOTED identifiers: a column with a space and one with
    // forced mixed case — legal DataFrame column names that unquoted
    // SQL would break on or silently fold
    // a column with a space and a reserved word — legal DataFrame
    // column names that unquoted SQL would break on
    withStatement(_.execute(
      "CREATE TABLE quoted_ii (\"user id\" VARCHAR(8) PRIMARY KEY, \"order\" DOUBLE)"))
    JdbcSink.insertIgnore(
      Seq(("u1", 1.0), ("u2", 2.0)).toDF("user id", "order"), url, "quoted_ii")
    // second batch replays u1 with a conflicting value (separate call:
    // within ONE batch, partition order would make "first writer"
    // nondeterministic)
    JdbcSink.insertIgnore(
      Seq(("u1", 9.9)).toDF("user id", "order"), url, "quoted_ii")
    assert(count("quoted_ii") == 2, "insert through quoted identifiers, dup ignored")
    val v = withStatement { st =>
      val rs = st.executeQuery("SELECT \"order\" FROM quoted_ii WHERE \"user id\" = 'u1'")
      rs.next(); rs.getDouble(1)
    }
    assert(v == 1.0, "first writer wins through the quoted path too")
  }

  test("insertIgnore handles NULL values") {
    withStatement(_.execute(
      "CREATE TABLE null_ii (k VARCHAR(8) PRIMARY KEY, v VARCHAR(16), d DOUBLE)"))
    JdbcSink.insertIgnore(
      Seq(("a", Option.empty[String], Option.empty[Double]),
        ("b", Some("x"), Some(1.5))).toDF("k", "v", "d"),
      url, "null_ii")
    assert(count("null_ii") == 2)
  }

  test("streaming writer: checkpointed stream into Derby is effectively-once") {
    withStatement(_.execute(
      """CREATE TABLE stream_ii (
        |  tweet_id VARCHAR(32) PRIMARY KEY, txt VARCHAR(256))""".stripMargin))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val df = mem.toDF().toDF("tweet_id", "txt")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-jdbc-ckpt").toString
    // data BEFORE start: AvailableNow latches end offsets at startup,
    // so addData after start() races the latch and can process 0 rows
    mem.addData(("s1", "one"), ("s2", "two"), ("s1", "dup-in-batch"))
    val q = JdbcSink.writer(df, url, "stream_ii", ckpt, Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(count("stream_ii") == 2)
    // second micro-batch replays an already-stored key
    mem.addData(("s2", "replay"), ("s3", "three"))
    val q2 = JdbcSink.writer(df, url, "stream_ii", ckpt, Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(count("stream_ii") == 3, "replayed key ignored, new key inserted")
  }
  test("PG dialect: insert statement carries ON CONFLICT (keys) DO NOTHING") {
    // pure statement-shape checks, no live PostgreSQL needed
    val q = (s: String) => if (s.matches("[A-Za-z][A-Za-z0-9_]*")) s else "\"" + s + "\""
    val pg = "jdbc:postgresql://db:5432/tweets"
    assert(JdbcSink.isPostgres(pg))
    assert(!JdbcSink.isPostgres(url), "Derby URL must not trigger the PG dialect")
    // the reference's exact clause (sentiment_analysis.py:382-393)
    assert(JdbcSink.onConflictSuffix(pg, Seq("tweet_id"), q)
      === " ON CONFLICT (tweet_id) DO NOTHING")
    // no declared keys -> any-unique-constraint form
    assert(JdbcSink.onConflictSuffix(pg, Nil, q) === " ON CONFLICT DO NOTHING")
    // composite keys + identifier quoting flow through the quoter
    assert(JdbcSink.onConflictSuffix(pg, Seq("tweet id", "lang"), q)
      === " ON CONFLICT (\"tweet id\", lang) DO NOTHING")
    // non-PG dialects keep the portable savepoint path
    assert(JdbcSink.onConflictSuffix(url, Seq("tweet_id"), q) === "")
    assert(JdbcSink.onConflictSuffix("jdbc:sqlite:/tmp/x.db", Seq("k"), q) === "")
  }

  test("Derby path ignores conflictKeys (still savepoint-based, still idempotent)") {
    withStatement(_.execute(
      "CREATE TABLE pgkeys_ii (tweet_id VARCHAR(40) PRIMARY KEY, txt VARCHAR(200))"))
    val batch = Seq(("a", "one"), ("a", "dup-in-batch"), ("b", "two")).toDF("tweet_id", "txt")
    JdbcSink.insertIgnore(batch, url, "pgkeys_ii", conflictKeys = Seq("tweet_id"))
    assert(count("pgkeys_ii") == 2, "conflictKeys on a non-PG URL must not change semantics")
  }

  // ------------------------------------------------------------------ //
  // PG-path replay hardening (VERDICT r14 #9): the REAL insertIgnore
  // runs end-to-end against a JDBC-level PG stand-in (FakePgDriver) —
  // only the wire is faked, so these pin the native-conflict path's
  // statement shape, savepoint-freedom, transaction boundaries, and
  // replay behavior that Derby (savepoint dialect) cannot exercise.
  // ------------------------------------------------------------------ //

  test("PG path: replayed duplicates are DO NOTHING no-ops — zero savepoints, reference statement") {
    FakePgDriver.ensureRegistered()
    val pgUrl = "jdbc:postgresql://stub/replaydb"
    val d = FakePgDriver.db(pgUrl); d.reset()
    val batch = Seq(("t1", "hello"), ("t2", "world")).toDF("tweet_id", "txt").coalesce(1)
    JdbcSink.insertIgnore(batch, pgUrl, "tweets", conflictKeys = Seq("tweet_id"))
    assert(d.committed.keySet == Set("t1", "t2"))
    // checkpoint replay: same batch + a conflicting rewrite of t1
    val replay = Seq(("t1", "CHANGED"), ("t2", "world"), ("t3", "new"))
      .toDF("tweet_id", "txt").coalesce(1)
    JdbcSink.insertIgnore(replay, pgUrl, "tweets", conflictKeys = Seq("tweet_id"))
    assert(d.committed.keySet == Set("t1", "t2", "t3"))
    assert(d.committed("t1")(1) == "hello", "first writer wins across replay")
    assert(d.savepoints == 0,
      "the native-conflict path must never bracket rows in savepoints")
    assert(d.statements.nonEmpty && d.statements.forall(
      _ == "INSERT INTO tweets (tweet_id, txt) VALUES (?, ?) ON CONFLICT (tweet_id) DO NOTHING"),
      s"reference statement expected, got: ${d.statements.distinct}")
  }

  test("PG path: mid-batch connection failure loses only the open window; replay completes exactly-once") {
    FakePgDriver.ensureRegistered()
    val pgUrl = "jdbc:postgresql://stub/crashdb"
    val d = FakePgDriver.db(pgUrl); d.reset()
    val rows = Seq(("a", "1"), ("b", "2"), ("c", "3"), ("d", "4"), ("e", "5"))
    val batch = rows.toDF("tweet_id", "txt").coalesce(1)
    // commitEvery=2: rows a,b commit; c enters the open window; d dies
    d.failOnceOnKey = Some("d")
    val thrown = intercept[org.apache.spark.SparkException] {
      JdbcSink.insertIgnore(batch, pgUrl, "tweets", commitEvery = 2,
        conflictKeys = Seq("tweet_id"))
    }
    assert(Option(thrown.getMessage).exists(_.contains("08006")) ||
      thrown.getCause != null, s"failure must surface, got: $thrown")
    assert(d.committed.keySet == Set("a", "b"),
      s"only the committed window survives a dropped connection, got ${d.committed.keySet}")
    // at-least-once replay of the WHOLE batch (what foreachBatch does
    // after the failed micro-batch retries): idempotent inserts make
    // the end state exactly-once
    JdbcSink.insertIgnore(batch, pgUrl, "tweets", commitEvery = 2,
      conflictKeys = Seq("tweet_id"))
    assert(d.committed.keySet == rows.map(_._1).toSet)
    assert(d.committed.values.forall(_.size == 2))
    assert(d.savepoints == 0)
  }
}
