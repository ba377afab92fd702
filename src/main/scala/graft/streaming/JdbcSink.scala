package graft.streaming

import java.sql.{DriverManager, SQLException, Types}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** K3's actual storage backend: a JDBC sink with INSERT-IGNORE
  * semantics — the reference stores every analyzed tweet with
  * `INSERT OR IGNORE` (SQLite) / `ON CONFLICT DO NOTHING` (PostgreSQL)
  * (sentiment_analysis.py:94-149, 367-448); this is the Spark-side
  * equivalent for any JDBC database with a primary/unique key on the
  * target table.
  *
  * Semantics: each row is inserted; a duplicate-key violation
  * (SQLState 23xxx) is swallowed — the FIRST writer of a key wins,
  * exactly the reference's behavior. Because the no-op on conflict
  * makes every insert idempotent, the at-least-once delivery of
  * `foreachBatch` upgrades to effectively-once end-to-end without a
  * transactional sink.
  *
  * Scale notes: one connection per partition (no driver funnel),
  * periodic commits bound transaction size, and the row-at-a-time
  * conflict handling mirrors the reference's executemany loop.
  * Dialects: a `jdbc:postgresql:` URL switches the statement to the
  * database's native `INSERT … ON CONFLICT (keys) DO NOTHING` — the
  * reference's own PG statement — with no exception control flow and
  * no savepoints (see [[onConflictSuffix]]); Derby — the embedded
  * database available in this sandbox — has no such clause, so the
  * portable per-row savepoint form is the integration-tested path.
  *
  * Portability of the swallow: engines differ in whether a
  * transaction stays usable after a statement error — Derby keeps it
  * usable, PostgreSQL aborts the whole transaction (25P02 on every
  * later statement until rollback). Each insert therefore runs under
  * a JDBC SAVEPOINT: on a duplicate key the transaction rolls back
  * to the savepoint and continues, which is the portable equivalent
  * of statement-level atomicity and costs one extra round-trip only
  * on the conflict path. Identifiers are quoted with the driver's
  * own quote string so mixed-case/reserved-word column names (legal
  * in a DataFrame schema) cannot break or redirect the statement. */
object JdbcSink {

  private def sqlTypeOf(dt: DataType): Int = dt match {
    case StringType => Types.VARCHAR
    case LongType => Types.BIGINT
    case IntegerType => Types.INTEGER
    case DoubleType => Types.DOUBLE
    case FloatType => Types.FLOAT
    case BooleanType => Types.BOOLEAN
    case TimestampType => Types.TIMESTAMP
    case DateType => Types.DATE
    case _: DecimalType => Types.DECIMAL
    case _ => Types.OTHER
  }

  /** ONLY unique/primary-key violations (SQLState 23505) are the
    * insert-ignore no-op; other integrity violations (23502 NOT NULL,
    * 23503 FK, 23514 CHECK…) must surface — swallowing them would
    * silently drop malformed rows and break the "first writer of a
    * key wins" contract. */
  private def isDuplicateKey(e: SQLException): Boolean =
    Option(e.getSQLState).contains("23505")

  /** PostgreSQL dialect detection: on PG the insert uses the engine-
    * native `ON CONFLICT … DO NOTHING` clause (the exact statement the
    * reference issues, sentiment_analysis.py:382-393) instead of the
    * portable savepoint-per-row exception dance — one round-trip per
    * row with NO exception control flow and no savepoint overhead on
    * the conflict path. */
  private[graft] def isPostgres(url: String): Boolean =
    url.startsWith("jdbc:postgresql:")

  /** The dialect-specific suffix of the insert statement. Pure — unit
    * tested without a live server. `conflictKeys` names the unique/PK
    * columns (e.g. `tweet_id`): with keys the clause targets exactly
    * that constraint (`ON CONFLICT (tweet_id) DO NOTHING`, the
    * reference's form); without, it covers any unique violation —
    * both match the 23505-swallow semantics of the portable path.
    * Non-PG dialects return "" and keep the savepoint path. */
  private[graft] def onConflictSuffix(url: String, conflictKeys: Seq[String],
      quoted: String => String): String =
    if (!isPostgres(url)) ""
    else if (conflictKeys.isEmpty) " ON CONFLICT DO NOTHING"
    else conflictKeys.map(quoted).mkString(" ON CONFLICT (", ", ", ") DO NOTHING")

  /** ANSI/common reserved words that are legal DataFrame column names
    * but must be quoted in SQL (see `quoted` in [[insertIgnore]]). */
  private[streaming] val ReservedWords: Set[String] = Set(
    "all", "alter", "and", "any", "as", "asc", "between", "by", "case",
    "check", "column", "constraint", "create", "default", "delete",
    "desc", "distinct", "drop", "else", "end", "exists", "from",
    "grant", "group", "having", "in", "index", "insert", "is", "join",
    "key", "like", "not", "null", "on", "or", "order", "primary",
    "select", "some", "table", "then", "to", "union", "update", "user",
    "values", "when", "where", "with")

  /** Insert every row of `batch` into `table` (columns matched by
    * name), ignoring duplicate-key violations. Executor-side: one
    * JDBC connection per partition. */
  def insertIgnore(batch: DataFrame, url: String, table: String,
                   commitEvery: Int = 1000, conflictKeys: Seq[String] = Nil): Unit = {
    val cols = batch.columns
    val types = batch.schema.fields.map(f => sqlTypeOf(f.dataType))
    batch.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          // Identifier handling: a REGULAR identifier (letter then
          // letters/digits/underscores) is left unquoted so the
          // database applies its own case folding and it matches
          // unquoted DDL (Derby/PG fold opposite directions — blanket
          // quoting would break every plain lowercase table created
          // with unquoted DDL). Anything else — spaces, reserved
          // punctuation, quote chars, a would-be injection payload —
          // is quoted with the driver's own quote string, with
          // embedded quotes doubled.
          val q = Option(conn.getMetaData.getIdentifierQuoteString)
            .map(_.trim).filter(_.nonEmpty).getOrElse("\"")
          // Reserved words are always quoted: unquoted DDL cannot have
          // created such a column, so the stored case is exactly what
          // the (necessarily quoted) DDL wrote and quoting is safe.
          def quoted(ident: String) =
            if (ident.matches("[A-Za-z][A-Za-z0-9_]*") &&
              !JdbcSink.ReservedWords(ident.toLowerCase))
              ident
            else q + ident.replace(q, q + q) + q
          // the table parameter may be schema-qualified ("app.tweets"):
          // quote each dot-separated part, not the whole string as one
          // identifier (column names are quoted whole — a dot in a
          // DataFrame column name is part of the name)
          val quotedTable = table.split('.').map(quoted).mkString(".")
          val suffix = onConflictSuffix(url, conflictKeys, quoted)
          val insertSql =
            s"INSERT INTO $quotedTable (${cols.map(quoted).mkString(", ")}) " +
              s"VALUES (${cols.map(_ => "?").mkString(", ")})" + suffix
          // native conflict clause → a duplicate inserts 0 rows, no
          // exception is raised, and no savepoint bracketing is needed
          val nativeIgnore = suffix.nonEmpty
          val ps = conn.prepareStatement(insertSql)
          var n = 0
          rows.foreach { r =>
            var i = 0
            while (i < cols.length) {
              val v = r.get(i)
              if (v == null) ps.setNull(i + 1, types(i)) else ps.setObject(i + 1, v)
              i += 1
            }
            if (nativeIgnore) {
              ps.executeUpdate() // ON CONFLICT DO NOTHING: 0 rows on dup
            } else {
              // savepoint-per-insert: on engines that abort the whole
              // transaction at the first statement error, rolling back
              // to the savepoint keeps the transaction usable so one
              // duplicate cannot poison the rest of the commit window;
              // on Derby it is a cheap no-op guard
              val sp = conn.setSavepoint()
              try {
                ps.executeUpdate()
                conn.releaseSavepoint(sp)
              } catch {
                case e: SQLException if isDuplicateKey(e) =>
                  conn.rollback(sp) // first writer wins
              }
            }
            n += 1
            if (n % commitEvery == 0) conn.commit()
          }
          conn.commit()
        } finally conn.close()
      }
    }
  }

  /** Streaming K3: enriched tweets → JDBC table, effectively-once via
    * checkpoint (at-least-once replay) × idempotent insert-ignore.
    * Batches are deduped first so a single batch carrying conflicting
    * rows for one key inserts its deterministic representative.
    *
    * `conflictKeys` defaults to Nil — on PG that emits the bare
    * `ON CONFLICT DO NOTHING`, which matches the portable path's
    * swallow-any-23505 semantics against ANY schema; a keyed default
    * (`Seq("tweet_id")`) would raise 'no matching constraint' on a
    * table without a unique constraint on that exact column where the
    * savepoint path used to work. Callers writing the reference's
    * tweets table pass `Seq("tweet_id")` explicitly to get its exact
    * `ON CONFLICT (tweet_id) DO NOTHING` statement. */
  def writer(enriched: DataFrame, url: String, table: String, checkpoint: String,
             trigger: Trigger = Trigger.ProcessingTime("60 seconds"),
             conflictKeys: Seq[String] = Nil)
  : DataStreamWriter[Row] =
    enriched.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        insertIgnore(Pipeline.dedupBatch(batch), url, table,
          conflictKeys = conflictKeys)
      }
}
