package graft.jdbc

/** Wire protocol of the thin-client JDBC proxy (java serialization over
  * a loopback TCP socket, one socket per JDBC connection).
  *
  * Why this exists at all: the reference's S1/K5 operators talk to a
  * SERVER database (PostgreSQL, db.py:17-77), which any executor
  * reaches over the network. The offline stand-in is embedded Derby —
  * single-JVM by design (db.lck) — so until round 12 the two JDBC
  * queries had to be EXCLUDED from the multi-JVM parity gate
  * (ClusterCheck), the one documented hole in the full-surface audit.
  * The sandbox ships no derbynet/derbyclient (and nothing can be
  * downloaded), so Derby's own network-server mode is unavailable;
  * this package supplies the same architecture with ~300 lines: a
  * socket server in the driver JVM fronting the embedded engine
  * ([[DerbyTcpServer]]) and a thin [[java.sql.Driver]] that forwards
  * statements and streams rows back ([[ProxyDriver]]). Executors —
  * in-process threads, forked local-cluster JVMs, anything on the host
  * — now open REAL network JDBC connections, so Spark's whole JDBC
  * read/write surface (schema probe, partitioned parallel reads with
  * pushed predicates, per-partition batched INSERT transactions)
  * crosses a process boundary exactly as it does against PostgreSQL.
  *
  * Fixture-scale by contract: `executeQuery` buffers the full result
  * set in one response (the gated tables are dims of tens of rows;
  * a production deployment talks to a real server database and never
  * loads this driver). Statement.cancel is a no-op for the same reason.
  */
private[jdbc] object Protocol {

  /** First message on a socket: open the embedded database at `dbPath`
    * (server appends `;create=true`). */
  final case class Open(dbPath: String) extends Serializable

  /** Execute `sql`. `query`=true → [[Rows]]; else with `batch`=false a
    * single update → [[Count]]; with `batch`=true one paramset per
    * batched row → [[Counts]]. Params are positional; SQL NULL travels
    * as [[SqlNull]] (setObject(null) loses the type Derby wants). */
  final case class Exec(sql: String, params: Array[Array[AnyRef]],
      query: Boolean, batch: Boolean) extends Serializable

  final case class SqlNull(sqlType: Int) extends Serializable

  final case class SetAutoCommit(on: Boolean) extends Serializable
  final case class SetIsolation(level: Int) extends Serializable
  case object Commit extends Serializable
  case object Rollback extends Serializable
  case object CloseConn extends Serializable

  case object Ok extends Serializable
  final case class Count(n: Int) extends Serializable
  final case class Counts(ns: Array[Int]) extends Serializable

  /** Everything Spark's `JdbcUtils.getSchema` reads off
    * ResultSetMetaData, captured server-side. */
  final case class ColMeta(name: String, typeCode: Int, typeName: String,
      precision: Int, scale: Int, nullable: Int, signed: Boolean)
    extends Serializable

  /** A fully-buffered result set. LOB columns are materialized
    * server-side (CLOB→String, BLOB→bytes): java.sql.Clob handles are
    * connection-scoped and not serializable. */
  final case class Rows(meta: Array[ColMeta], rows: Array[Array[AnyRef]])
    extends Serializable

  /** SQLException surrogate — rethrown client-side with the original
    * state/code so callers like Spark's tableExists probe (which RELIES
    * on the missing-table failure) behave identically. */
  final case class Err(message: String, sqlState: String, code: Int)
    extends Serializable

  /** Deserialization allowlist for both wire ends ([[DerbyTcpServer]]
    * and [[ProxyDriver.Wire]]): `ObjectInputStream.readObject()` on a
    * socket that any local process can reach is the classic Java
    * gadget-chain surface, loopback or not. The filter admits ONLY the
    * protocol classes, the boxed/temporal/decimal value types Derby
    * actually returns (and their serial-form internals), and primitive
    * or allowlisted-component arrays — everything else is rejected
    * before its class initializer or readObject can run.
    * JdbcProxySpec pins the rejection with a live non-protocol object. */
  private val AllowedValueClasses: Set[String] = Set(
    "java.lang.String", "java.lang.Boolean", "java.lang.Byte",
    "java.lang.Short", "java.lang.Integer", "java.lang.Long",
    "java.lang.Float", "java.lang.Double", "java.lang.Character",
    "java.lang.Number", "java.lang.Object", "java.lang.Class",
    "java.lang.Enum",
    "java.math.BigDecimal", "java.math.BigInteger",
    "java.sql.Date", "java.sql.Time", "java.sql.Timestamp",
    "java.util.Date",
    // Scala case objects (Ok/Commit/...) serialize through this proxy
    "scala.runtime.ModuleSerializationProxy")

  /** Resource ceilings enforced alongside the class allowlist: without
    * them a peer could still exhaust memory with an ALLOWED shape, e.g.
    * `long[Integer.MAX_VALUE]` (a 16 GiB allocation from a 17-byte
    * header) or a deeply nested `Object[]` that overflows the parser
    * stack. 1<<26 elements bounds any single array at 512 MiB of longs —
    * far above a real partitioned-read slice, far below the attack.
    * No `streamBytes` cap on purpose: both wire ends keep ONE
    * ObjectInputStream alive across the whole connection (thousands of
    * request/response objects), and streamBytes is cumulative over the
    * stream, so any fixed byte cap would kill legitimate long-lived
    * connections rather than large single objects. */
  private val MaxArrayLength = 1L << 26
  private val MaxGraphDepth = 64L

  private[jdbc] val wireFilter: java.io.ObjectInputFilter =
    (info: java.io.ObjectInputFilter.FilterInfo) => {
      if (info.arrayLength() > MaxArrayLength || info.depth() > MaxGraphDepth)
        java.io.ObjectInputFilter.Status.REJECTED
      else {
        val cl = info.serialClass()
        if (cl == null) java.io.ObjectInputFilter.Status.UNDECIDED
        else {
          var c = cl
          while (c.isArray) c = c.getComponentType
          val ok = c.isPrimitive ||
            c.getName.startsWith("graft.jdbc.Protocol$") ||
            AllowedValueClasses.contains(c.getName)
          if (ok) java.io.ObjectInputFilter.Status.ALLOWED
          else java.io.ObjectInputFilter.Status.REJECTED
        }
      }
    }
}
