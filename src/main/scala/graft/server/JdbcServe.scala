package graft.server

import org.apache.spark.sql.SparkSession

/** External SQL-client attach surface — the Spark-native analogue of the
  * reference's second JDBC connection (kwack runs sqlline against the
  * embedded DuckDB over JDBC, KwackEngine.java:258-272): a HiveServer2
  * thrift endpoint bound to THIS engine's SparkSession, so any
  * hive-jdbc/beeline/BI client can attach and query the engine's topic
  * views, tables, and registered functions over the wire.
  *
  * Design notes:
  *  - `singleSession=true` binds every JDBC connection to the engine's
  *    own session state — the attach surface sees exactly the temp views
  *    `Engine.init` registered (kwack's JDBC connection likewise shares
  *    the one embedded database).
  *  - The port defaults to an OS-assigned free port (probed, then bound
  *    by the server) so test rigs and multi-engine hosts never collide.
  *  - At cluster scale this is the standard Spark Thrift Server
  *    deployment: the driver hosts the endpoint, queries fan out to the
  *    executors; nothing engine-side changes.
  */
object JdbcServe {

  /** One server per JVM (HiveServer2 registers global state). */
  @volatile private var running: Option[(AnyRef, Int)] = None

  /** Session confs the thrift layer mutates on open (in singleSession
    * mode that hits the SHARED session state): snapshot at start, restore
    * at stop, so serving never leaves the engine session reconfigured.
    * Known mutation: SparkSQLSessionManager.openSession enables
    * spark.sql.datetime.java8API.enabled for result-set encoding. */
  private val volatileConfs = Seq("spark.sql.datetime.java8API.enabled")
  @volatile private var savedConfs: Map[String, Option[String]] = Map.empty
  @volatile private var boundSession: Option[SparkSession] = None

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  @volatile private var served: Option[(SparkSession, graft.Engine)] = None

  /** Start the endpoint AND bind the engine's full SQL dialect to the
    * session (GraftSqlFront), so attached clients get `COPY ... TO`,
    * `FROM 'file'`, macros, PREPARE/EXECUTE, ASOF SQL, session DML —
    * the reference's attach serves its full DuckDB dialect the same way
    * (KwackEngine.java:258-272). Requires the session to have been built
    * with `spark.sql.extensions=graft.GraftExtensions` (Main does;
    * TestSpark does) — without it the endpoint still serves plain Spark
    * SQL over the shared temp views. */
  def start(engine: graft.Engine, port: Int): Int = synchronized {
    val p = start(engine.spark, port)
    graft.GraftSqlFront.bind(engine.spark, engine)
    served = Some((engine.spark, engine))
    p
  }

  /** Start (or return the already-running) thrift endpoint on the given
    * session. Returns the bound port. HiveServer2 state is JVM-global, so
    * a second start with a DIFFERENT explicit port cannot be honored —
    * that is an error, not a silent fallback to the old port. The
    * OS-assigned free-port probe is probe-then-bind racy (another process
    * can grab the probed port before the server binds), so auto-port
    * bring-up retries with a fresh probe on bind failure. */
  def start(spark: SparkSession, port: Int = 0): Int = synchronized {
    running match {
      case Some((_, p)) =>
        require(port <= 0 || port == p,
          s"thrift endpoint already running on port $p; cannot rebind to " +
            s"requested port $port in this JVM (HiveServer2 state is " +
            "JVM-global — stop() cannot restart it)")
        p
      case None =>
        var attempts = if (port > 0) 1 else 3
        var last: Throwable = null
        while (attempts > 0) {
          val p = if (port > 0) port else freePort()
          try return startOn(spark, p)
          catch {
            case e: Exception =>
              last = e; attempts -= 1
              if (attempts > 0)
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"thrift bind on probed port $p failed (probe-then-bind " +
                    s"race?); retrying with a fresh port", e)
          }
        }
        throw new IllegalStateException(
          "could not start thrift endpoint" +
            (if (port > 0) s" on requested port $port" else ""), last)
    }
  }

  private def startOn(spark: SparkSession, p: Int): Int = {
    val sc = spark.sqlContext
    sc.setConf("hive.server2.thrift.port", p.toString)
    sc.setConf("hive.server2.thrift.bind.host", "localhost")
    sc.setConf("hive.server2.transport.mode", "binary")
    // every JDBC session should share the engine's session state
    // (temp views, registered graft_* functions) — the reference
    // semantics. singleSession is a STATIC conf: it must be set when
    // the SparkSession is built (Main does; TestSpark does). Warn
    // rather than fail so a metastore-backed deployment (where
    // catalog tables are visible to every session anyway) can still
    // serve.
    if (!spark.conf.getOption("spark.sql.hive.thriftServer.singleSession")
        .exists(_.toBoolean))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "spark.sql.hive.thriftServer.singleSession is not set: JDBC " +
          "sessions will not see this engine's temp views (set it at " +
          "session build time)")
    savedConfs = volatileConfs
      .map(k => k -> spark.conf.getOption(k)).toMap
    boundSession = Some(spark)
    val srv = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(sc)
    // the thrift listener binds on its own thread, so a bind failure
    // (port taken between probe and bind) is asynchronous — verify the
    // port actually accepts a TCP connection before declaring success
    if (!portAccepts(p, 30000)) {
      try srv.stop() catch { case _: Exception => () }
      boundSession = None; savedConfs = Map.empty
      throw new java.net.BindException(
        s"thrift endpoint did not come up on port $p")
    }
    running = Some((srv, p))
    p
  }

  private def portAccepts(p: Int, timeoutMs: Long): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (System.nanoTime() < deadline) {
      try {
        val s = new java.net.Socket()
        try { s.connect(new java.net.InetSocketAddress("localhost", p), 500); return true }
        finally s.close()
      } catch { case _: Exception => Thread.sleep(100) }
    }
    false
  }

  /** Stop the endpoint and restore mutated session confs. NOTE:
    * HiveServer2 keeps JVM-global state — a stopped endpoint cannot be
    * restarted in the same JVM; stop() is a shutdown-time call. */
  def stop(): Unit = synchronized {
    running.foreach { case (srv, _) =>
      srv.asInstanceOf[org.apache.hive.service.server.HiveServer2].stop()
    }
    boundSession.foreach { s =>
      savedConfs.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }
    served.foreach { case (s, e) => graft.GraftSqlFront.unbind(s, e) }
    served = None
    boundSession = None
    savedConfs = Map.empty
    running = None
  }

  /** Blocking connect helper with retry — server bring-up is async. */
  def connect(port: Int, timeoutMs: Long = 30000): java.sql.Connection = {
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    val url = s"jdbc:hive2://localhost:$port/default"
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var last: Throwable = null
    while (System.nanoTime() < deadline) {
      try return java.sql.DriverManager.getConnection(url, "anonymous", "")
      catch { case e: Exception => last = e; Thread.sleep(250) }
    }
    throw new IllegalStateException(
      s"could not attach to thrift endpoint on port $port", last)
  }
}
