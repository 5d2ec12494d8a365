package graft.jdbc

import java.io.{BufferedInputStream, BufferedOutputStream, ObjectInputStream,
  ObjectOutputStream}
import java.lang.reflect.{InvocationHandler, Method, Proxy => JProxy}
import java.net.Socket
import java.sql.{Connection, DatabaseMetaData, Driver, DriverPropertyInfo,
  PreparedStatement, ResultSet, ResultSetMetaData, SQLException,
  SQLFeatureNotSupportedException}

import scala.collection.mutable.ArrayBuffer

import Protocol._

/** Thin-client [[java.sql.Driver]] for [[DerbyTcpServer]] — the client
  * half of the proxy (see [[Protocol]] for the why).
  *
  * URL shape: `jdbc:derby://host:port/dbPath` — deliberately the
  * derbyclient URL form, because Spark picks its SQL dialect by URL
  * prefix: `jdbc:derby` selects DerbyDialect, so type mapping,
  * identifier quoting and the schema probe are EXACTLY what a real
  * Derby network deployment gets (the absent derbyclient jar leaves the
  * prefix free). Spark instantiates the class named in the `driver`
  * option directly, so registration-order ambiguity with the embedded
  * driver never arises.
  *
  * Only the call surface Spark's JDBC source/sink actually uses is
  * implemented — schema probe, partitioned reads, transactional batched
  * writes, DDL — via [[java.lang.reflect.Proxy]] over the JDBC
  * interfaces (Connection alone has 50+ methods; a proxy keeps the
  * unused ones as explicit SQLFeatureNotSupportedException sites
  * instead of 1,500 lines of stubs). Anything unexpected fails loudly
  * with the method name.
  */
final class ProxyDriver extends Driver {

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:derby://")

  override def connect(url: String, info: java.util.Properties): Connection = {
    if (!acceptsURL(url)) return null // JDBC contract: not ours → null
    val rest = url.stripPrefix("jdbc:derby://")
    val slash = rest.indexOf('/')
    require(slash > 0, s"malformed proxy URL: $url")
    val hostPort = rest.substring(0, slash).split(":", 2)
    val dbPath = rest.substring(slash + 1)
    val wire = new ProxyDriver.Wire(hostPort(0), hostPort(1).toInt)
    wire.call(Open(dbPath))
    ProxyDriver.connection(wire, url)
  }

  override def getPropertyInfo(url: String, info: java.util.Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    throw new SQLFeatureNotSupportedException("getParentLogger")
}

private object ProxyDriver {

  /** One socket = one JDBC connection; requests are strictly
    * request/response, serialized by this lock (Spark uses a connection
    * from a single task thread; Statement.cancel is a documented no-op). */
  final class Wire(host: String, port: Int) {
    private val sock = new Socket(host, port)
    sock.setTcpNoDelay(true)
    private val out = new ObjectOutputStream(new BufferedOutputStream(sock.getOutputStream))
    out.flush()
    private val in = new ObjectInputStream(new BufferedInputStream(sock.getInputStream))
    in.setObjectInputFilter(wireFilter) // reject non-protocol classes

    def call(req: AnyRef): AnyRef = synchronized {
      out.writeObject(req)
      out.reset()
      out.flush()
      in.readObject() match {
        case Err(msg, state, code) => throw new SQLException(msg, state, code)
        case r => r
      }
    }

    def shutdown(): Unit = { try sock.close() catch { case _: Throwable => () } }
  }

  private def proxyOf[T](cls: Class[T])(
      handle: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    JProxy.newProxyInstance(cls.getClassLoader, Array[Class[_]](cls),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method, rawArgs: Array[AnyRef]): AnyRef = {
          val args = if (rawArgs == null) Array.empty[AnyRef] else rawArgs
          val key = (m.getName, args)
          if (handle.isDefinedAt(key)) handle(key)
          else m.getName match {
            case "toString" => s"graft-proxy-${cls.getSimpleName}"
            case "hashCode" => Int.box(System.identityHashCode(p))
            case "equals" => Boolean.box(p eq args(0))
            case "isWrapperFor" => Boolean.box(false)
            case other => throw new SQLFeatureNotSupportedException(
              s"${cls.getSimpleName}.$other is outside the proxy driver's Spark-JDBC surface")
          }
        }
      }).asInstanceOf[T]

  def connection(wire: Wire, url: String): Connection = {
    var autoCommit = true
    var isolation = Connection.TRANSACTION_READ_COMMITTED // Derby default
    var closed = false
    lazy val meta: DatabaseMetaData = proxyOf(classOf[DatabaseMetaData]) {
      case ("supportsTransactions", _) => Boolean.box(true)
      case ("supportsDataManipulationTransactionsOnly", _) => Boolean.box(false)
      case ("supportsTransactionIsolationLevel", _) => Boolean.box(true)
      case ("getDatabaseProductName", _) => "Apache Derby"
      case ("getDatabaseProductVersion", _) => "10.16 (graft proxy)"
      case ("getDatabaseMajorVersion", _) => Int.box(10)
      case ("getDatabaseMinorVersion", _) => Int.box(16)
      case ("getDriverName", _) => "graft-derby-proxy"
      case ("getDriverVersion", _) => "1.0"
      case ("getDriverMajorVersion", _) => Int.box(1)
      case ("getDriverMinorVersion", _) => Int.box(0)
      case ("getDefaultTransactionIsolation", _) =>
        Int.box(Connection.TRANSACTION_READ_COMMITTED) // Derby's default
      case ("getJDBCMajorVersion", _) => Int.box(4)
      case ("getJDBCMinorVersion", _) => Int.box(2)
      case ("getURL", _) => url
      case ("getUserName", _) => ""
    }
    proxyOf(classOf[Connection]) {
      case ("prepareStatement", args) if args.nonEmpty =>
        statement(wire, Some(args(0).asInstanceOf[String]))
      case ("createStatement", _) => statement(wire, None)
      case ("setAutoCommit", Array(b: java.lang.Boolean)) =>
        wire.call(SetAutoCommit(b)); autoCommit = b; null
      case ("getAutoCommit", _) => Boolean.box(autoCommit)
      case ("commit", _) => wire.call(Commit); null
      case ("rollback", _) => wire.call(Rollback); null
      case ("setTransactionIsolation", Array(l: Integer)) =>
        wire.call(SetIsolation(l)); isolation = l; null
      case ("getTransactionIsolation", _) => Int.box(isolation)
      case ("getMetaData", _) => meta
      case ("close", _) =>
        if (!closed) { try wire.call(CloseConn) finally wire.shutdown(); closed = true }
        null
      case ("isClosed", _) => Boolean.box(closed)
      case ("isValid", _) => Boolean.box(!closed)
      case ("getWarnings", _) => null
      case ("clearWarnings", _) => null
      case ("getCatalog", _) => null
      case ("getSchema", _) => null
    }
  }

  /** One proxy serves both Statement and PreparedStatement: Spark uses
    * the prepared form everywhere except DDL (executeStatement's
    * createStatement + executeUpdate). */
  private def statement(wire: Wire, preparedSql: Option[String]): PreparedStatement = {
    val params = ArrayBuffer.empty[AnyRef]
    val batch = ArrayBuffer.empty[Array[AnyRef]]
    var closed = false
    def setParam(idx: Int, v: AnyRef): AnyRef = {
      while (params.length < idx) params += null
      params(idx - 1) = v
      null
    }
    def snapshot(): Array[AnyRef] = params.toArray
    proxyOf(classOf[PreparedStatement]) {
      case ("setNull", Array(i: Integer, t: Integer)) => setParam(i, SqlNull(t))
      case (n, Array(i: Integer, v)) if n.startsWith("set") &&
          (n != "setFetchSize" && n != "setQueryTimeout" && n != "setMaxRows") =>
        setParam(i, v) // typed setters all box to a serializable object
      case ("clearParameters", _) => params.clear(); null
      case ("addBatch", Array()) => batch += snapshot(); null
      case ("executeBatch", _) =>
        val r = wire.call(Exec(preparedSql.get, batch.toArray, query = false,
          batch = true)).asInstanceOf[Counts].ns
        batch.clear(); r
      case ("clearBatch", _) => batch.clear(); null
      case ("executeQuery", Array()) =>
        resultSet(wire.call(Exec(preparedSql.get, Array(snapshot()),
          query = true, batch = false)).asInstanceOf[Rows])
      case ("executeQuery", Array(sql: String)) =>
        resultSet(wire.call(Exec(sql, Array.empty, query = true,
          batch = false)).asInstanceOf[Rows])
      case ("executeUpdate", Array()) =>
        Int.box(wire.call(Exec(preparedSql.get, Array(snapshot()), query = false,
          batch = false)).asInstanceOf[Count].n)
      case ("executeUpdate", Array(sql: String)) =>
        Int.box(wire.call(Exec(sql, Array.empty, query = false,
          batch = false)).asInstanceOf[Count].n)
      case ("setQueryTimeout" | "setFetchSize" | "setMaxRows", _) => null
      case ("getQueryTimeout" | "getFetchSize" | "getMaxRows", _) => Int.box(0)
      case ("cancel", _) => null // fixture-scale: queries are short (Protocol doc)
      case ("close", _) => closed = true; null
      case ("isClosed", _) => Boolean.box(closed)
      case ("getWarnings", _) => null
      case ("clearWarnings", _) => null
    }
  }

  private def resultSet(data: Rows): ResultSet = {
    val meta = data.meta
    val rows = data.rows
    var idx = -1
    var nullSeen = false
    def value(col: Int): AnyRef = {
      val v = rows(idx)(col - 1)
      nullSeen = v == null
      v
    }
    def num(col: Int): Number = value(col) match {
      case null => null
      case n: Number => n
      case b: java.lang.Boolean => Int.box(if (b) 1 else 0)
      case other => new java.math.BigDecimal(other.toString)
    }
    def colIndex(label: String): Int = {
      val i = meta.indexWhere(_.name.equalsIgnoreCase(label))
      if (i < 0) throw new SQLException(s"no such column: $label")
      i + 1
    }
    lazy val rsMeta: ResultSetMetaData = proxyOf(classOf[ResultSetMetaData]) {
      case ("getColumnCount", _) => Int.box(meta.length)
      case ("getColumnName" | "getColumnLabel", Array(i: Integer)) => meta(i - 1).name
      case ("getColumnType", Array(i: Integer)) => Int.box(meta(i - 1).typeCode)
      case ("getColumnTypeName", Array(i: Integer)) => meta(i - 1).typeName
      case ("getPrecision", Array(i: Integer)) => Int.box(meta(i - 1).precision)
      case ("getScale", Array(i: Integer)) => Int.box(meta(i - 1).scale)
      case ("isNullable", Array(i: Integer)) => Int.box(meta(i - 1).nullable)
      case ("isSigned", Array(i: Integer)) => Boolean.box(meta(i - 1).signed)
      case ("isAutoIncrement" | "isCaseSensitive" | "isCurrency", _) => Boolean.box(false)
      case ("isSearchable", _) => Boolean.box(true)
      case ("getColumnDisplaySize", Array(i: Integer)) => Int.box(meta(i - 1).precision)
      case ("getCatalogName" | "getSchemaName" | "getTableName", _) => ""
    }
    proxyOf(classOf[ResultSet]) {
      case ("next", _) => idx += 1; Boolean.box(idx < rows.length)
      case ("close", _) => null
      case ("isClosed", _) => Boolean.box(false)
      case ("wasNull", _) => Boolean.box(nullSeen)
      case ("getMetaData", _) => rsMeta
      case ("findColumn", Array(l: String)) => Int.box(colIndex(l))
      case ("getObject", Array(i: Integer)) => value(i)
      case ("getString", Array(i: Integer)) =>
        value(i) match { case null => null; case v => v.toString }
      case ("getBoolean", Array(i: Integer)) => value(i) match {
        case null => Boolean.box(false)
        case b: java.lang.Boolean => b
        case n: Number => Boolean.box(n.intValue() != 0)
        case other => Boolean.box(other.toString.toBoolean)
      }
      case ("getByte", Array(i: Integer)) =>
        num(i) match { case null => Byte.box(0); case n => Byte.box(n.byteValue()) }
      case ("getShort", Array(i: Integer)) =>
        num(i) match { case null => Short.box(0); case n => Short.box(n.shortValue()) }
      case ("getInt", Array(i: Integer)) =>
        num(i) match { case null => Int.box(0); case n => Int.box(n.intValue()) }
      case ("getLong", Array(i: Integer)) =>
        num(i) match { case null => Long.box(0L); case n => Long.box(n.longValue()) }
      case ("getFloat", Array(i: Integer)) =>
        num(i) match { case null => Float.box(0f); case n => Float.box(n.floatValue()) }
      case ("getDouble", Array(i: Integer)) =>
        num(i) match { case null => Double.box(0d); case n => Double.box(n.doubleValue()) }
      case ("getBigDecimal", Array(i: Integer)) => value(i) match {
        case null => null
        case d: java.math.BigDecimal => d
        case n => new java.math.BigDecimal(n.toString)
      }
      case ("getBytes", Array(i: Integer)) => value(i)
      case ("getTimestamp", Array(i: Integer)) => value(i)
      case ("getDate", Array(i: Integer)) => value(i)
      case ("getTime", Array(i: Integer)) => value(i)
      case (getter, Array(l: String)) if getter.startsWith("get") =>
        // label-addressed getters recurse through the positional form
        val i = Int.box(colIndex(l))
        getter match {
          case "getObject" => value(i)
          case "getString" => value(i) match { case null => null; case v => v.toString }
          case _ => throw new SQLFeatureNotSupportedException(s"ResultSet.$getter(label)")
        }
    }
  }
}
