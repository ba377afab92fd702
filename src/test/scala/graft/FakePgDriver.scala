package graft

import java.sql.{Connection, DatabaseMetaData, Driver, DriverManager, PreparedStatement, SQLException}
import java.lang.reflect.{InvocationHandler, Method, Proxy}
import scala.collection.mutable

/** A JDBC-level PostgreSQL STAND-IN for JdbcSinkSpec (VERDICT r14 #9):
  * no PG server or pgjdbc exists in-sandbox, so this driver accepts
  * `jdbc:postgresql:` URLs and models exactly the slice of PG the K3
  * sink's native-conflict path touches —
  *   - `INSERT … ON CONFLICT … DO NOTHING`: a duplicate key inserts 0
  *     rows and raises NOTHING (the whole point of the dialect);
  *   - transaction semantics: rows become durable only at commit();
  *     close() without commit discards the pending window (what a
  *     dropped connection does to an open PG transaction);
  *   - a scriptable transient failure (SQLState 08006) on a chosen
  *     key, to model a connection reset mid-batch.
  * Everything is recorded (statements, savepoint count, commits) so
  * the spec can assert the PG path issues the reference's statement
  * and NEVER brackets rows in savepoints. Built on dynamic proxies:
  * only methods [[graft.streaming.JdbcSink.insertIgnore]] actually
  * calls are implemented; anything else returns a benign default.
  *
  * This is the strongest PG verification the sandbox allows: the REAL
  * sink code runs unmodified from partition iterator to commit, and
  * only the wire is faked. */
object FakePgDriver {

  /** One logical "database" shared across connections (the sink opens
    * one connection per partition; local-mode executors share this
    * JVM). Key = first bound parameter (the conflict column). */
  final class Db {
    val committed = mutable.LinkedHashMap.empty[AnyRef, Vector[AnyRef]]
    var statements = Vector.empty[String]
    var commits = 0
    var savepoints = 0
    /** key whose insert throws 08006 — cleared after firing once */
    @volatile var failOnceOnKey: Option[AnyRef] = None
    def reset(): Unit = synchronized {
      committed.clear(); statements = Vector.empty; commits = 0
      savepoints = 0; failOnceOnKey = None
    }
  }

  private val dbs = mutable.Map.empty[String, Db]
  def db(url: String): Db = synchronized(dbs.getOrElseUpdate(url, new Db))

  private def proxy[T](clazz: Class[T])(h: (String, Array[AnyRef]) => AnyRef): T =
    Proxy.newProxyInstance(clazz.getClassLoader, Array[Class[_]](clazz),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          h(m.getName, if (args == null) Array.empty else args)
      }).asInstanceOf[T]

  private def metaData: DatabaseMetaData =
    proxy(classOf[DatabaseMetaData]) {
      case ("getIdentifierQuoteString", _) => "\""
      case _ => null
    }

  private def connection(d: Db): Connection = {
    // per-connection transaction state
    val pending = mutable.LinkedHashMap.empty[AnyRef, Vector[AnyRef]]

    def prepared(sql: String): PreparedStatement = {
      val params = mutable.Map.empty[Int, AnyRef]
      proxy(classOf[PreparedStatement]) {
        case ("setObject", a) => params(a(0).asInstanceOf[Integer].intValue) = a(1); null
        case ("setNull", a) => params(a(0).asInstanceOf[Integer].intValue) = null; null
        case ("executeUpdate", _) =>
          d.synchronized {
            val key = params.getOrElse(1, null)
            if (d.failOnceOnKey.contains(key)) {
              d.failOnceOnKey = None
              throw new SQLException("connection reset by peer", "08006")
            }
            if (!sql.contains("ON CONFLICT"))
              throw new SQLException(s"fake PG only models ON CONFLICT inserts, got: $sql")
            if (d.committed.contains(key) || pending.contains(key))
              Integer.valueOf(0) // DO NOTHING: no exception, zero rows
            else {
              pending(key) = params.toSeq.sortBy(_._1).map(_._2).toVector
              Integer.valueOf(1)
            }
          }
        case ("close", _) => null
        case _ => null
      }
    }

    proxy(classOf[Connection]) {
      case ("setAutoCommit", _) => null
      case ("getMetaData", _) => metaData
      case ("prepareStatement", a) =>
        val sql = a(0).asInstanceOf[String]
        d.synchronized { d.statements :+= sql }
        prepared(sql)
      case ("commit", _) =>
        d.synchronized { d.committed ++= pending; pending.clear(); d.commits += 1 }
        null
      case ("setSavepoint", _) =>
        d.synchronized { d.savepoints += 1 }
        proxy(classOf[java.sql.Savepoint])((_, _) => null)
      case ("rollback", _) | ("releaseSavepoint", _) => null
      case ("close", _) => pending.clear(); null // open transaction: discarded
      case ("isClosed", _) => java.lang.Boolean.FALSE
      case _ => null
    }
  }

  /** Concrete class (not a proxy): DriverManager resolves the driver's
    * class name through the caller's classloader before using it, and
    * JDK proxy class names do not resolve there. */
  final class PgStandInDriver extends Driver {
    override def acceptsURL(url: String): Boolean = url.startsWith("jdbc:postgresql:")
    override def connect(url: String, info: java.util.Properties): Connection =
      if (acceptsURL(url)) connection(db(url)) else null
    override def getPropertyInfo(url: String, info: java.util.Properties) =
      Array.empty[java.sql.DriverPropertyInfo]
    override def getMajorVersion: Int = 0
    override def getMinorVersion: Int = 1
    override def jdbcCompliant(): Boolean = false
    override def getParentLogger: java.util.logging.Logger =
      throw new java.sql.SQLFeatureNotSupportedException()
  }

  @volatile private var registered = false
  def ensureRegistered(): Unit = synchronized {
    if (!registered) { DriverManager.registerDriver(new PgStandInDriver); registered = true }
  }
}
