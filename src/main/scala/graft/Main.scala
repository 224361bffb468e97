package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.serde.Serde
import graft.sources.KafkaRecords

/** CLI entry point mirroring the reference's surface (reference:
  * KwackMain.java:49-138):
  *
  * {{{
  * graft.Main [-t topic[=records.parquet]]... [-k topic=serde]...
  *            [-v topic=serde]... [-a attrs] [-q query] [-x|-s skipBytes]
  *            [-b bootstrapServers] [-p topic=0,1,2] [-o topic=offsetSpec]
  *            [-m metadataTimeoutMs] [-r registryUrl] [-d dbDir]
  *            [-F propsFile] [-X key=value]... [-j jdbcPort]
  *            [-c attachJdbcUrl]
  * }}}
  *
  * Record source: with `-b`, each topic is a batch Kafka read (consume to
  * current end, the reference's snapshot semantics); with `-t topic=file`,
  * records come from a parquet file in the Kafka record schema (offline /
  * test mode); with `-d dir`, topics decoded earlier and saved there are
  * restored (the reference's file-backed db, KwackConfig.java:92-94 — here
  * the persistence format is parquet per table). With `-q` the query runs
  * once and rows print as JSON lines (reference: KwackMain.java:157-163);
  * otherwise an interactive REPL reads SQL from stdin (KwackEngine.java:258-272).
  *
  * `-F` loads the reference's properties-file config surface
  * (KwackConfig.java: `topics`, `key.serdes`, `value.serdes`, `query`,
  * `row.attributes`, `skip.bytes`, `schema.registry.url`, `db`,
  * `bootstrap.servers`); flags given after `-F` override it. `-X key=value`
  * passes through: `kafka.*` to the Kafka reader, `spark.*` to the session
  * conf (reference: KwackMain.java:136-138 `-X` passthrough).
  */
object Main {

  private[graft] final case class Cli(
      topics: Vector[(String, Option[String])] = Vector.empty,
      keySerdes: Map[String, Serde] = Map.empty,
      valueSerdes: Map[String, Serde] = Map.empty,
      rowAttrs: Set[String] = Engine.defaultRowAttrs,
      query: Option[String] = None,
      skipBytes: Int = 0,
      brokers: Option[String] = None,
      partitions: Map[String, Seq[Int]] = Map.empty,
      offsets: Map[String, String] = Map.empty,
      metadataTimeoutMs: Option[Long] = None,
      registryUrl: Option[String] = None,
      dbDir: Option[String] = None,
      passthrough: Map[String, String] = Map.empty,
      jdbcPort: Option[Int] = None,
      attachUrl: Option[String] = None)

  private def splitKv(s: String): (String, String) = {
    val i = s.indexOf('=')
    require(i > 0, s"expected key=value, got: $s")
    (s.substring(0, i), s.substring(i + 1))
  }

  private def addTopics(c: Cli, v: String): Cli = {
    val eq = v.indexOf('=')
    val t = if (eq > 0) (v.substring(0, eq), Some(v.substring(eq + 1))) else (v, None)
    // same topic via -t and -F must not decode twice; a later file source
    // refines an earlier bare mention
    c.topics.indexWhere(_._1 == t._1) match {
      case -1 => c.copy(topics = c.topics :+ t)
      case i if t._2.isDefined => c.copy(topics = c.topics.updated(i, t))
      case _ => c
    }
  }

  /** Properties-file config (reference: KwackConfig key names). */
  private def applyProps(c0: Cli, path: String): Cli = {
    val props = new java.util.Properties
    val in = new java.io.FileInputStream(path)
    try props.load(in) finally in.close()
    def get(k: String) = Option(props.getProperty(k)).map(_.trim).filter(_.nonEmpty)
    var c = c0
    get("topics").foreach(_.split(",").foreach(t => c = addTopics(c, t.trim)))
    def serdes(k: String): Map[String, Serde] =
      get(k).map(_.split(",").map { kv =>
        val (t, s) = splitKv(kv.trim); t -> Serde.parse(s)
      }.toMap).getOrElse(Map.empty)
    c = c.copy(
      keySerdes = c.keySerdes ++ serdes("key.serdes"),
      valueSerdes = c.valueSerdes ++ serdes("value.serdes"))
    get("query").foreach(q => c = c.copy(query = Some(q)))
    get("row.attributes").foreach(a =>
      c = c.copy(rowAttrs = a.split(",").filter(_.nonEmpty).toSet))
    get("skip.bytes").foreach(s => c = c.copy(skipBytes = s.toInt))
    get("schema.registry.url").foreach(u => c = c.copy(registryUrl = Some(u)))
    get("db").foreach(d => c = c.copy(dbDir = Some(d)))
    get("bootstrap.servers").foreach(b => c = c.copy(brokers = Some(b)))
    c
  }

  private[graft] def parse(args: Array[String]): Cli = {
    var c = Cli()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-t" => c = addTopics(c, args(i + 1)); i += 2
        case "-k" => val (t, s) = splitKv(args(i + 1)); i += 2
          c = c.copy(keySerdes = c.keySerdes + (t -> Serde.parse(s)))
        case "-v" => val (t, s) = splitKv(args(i + 1)); i += 2
          c = c.copy(valueSerdes = c.valueSerdes + (t -> Serde.parse(s)))
        case "-a" => c = c.copy(rowAttrs =
          args(i + 1).split(",").filter(_.nonEmpty).toSet); i += 2
        case "-q" => c = c.copy(query = Some(args(i + 1))); i += 2
        case "-s" | "-x" => c = c.copy(skipBytes = args(i + 1).toInt); i += 2
        case "-b" => c = c.copy(brokers = Some(args(i + 1))); i += 2
        case "-p" => val (t, p) = splitKv(args(i + 1)); i += 2
          c = c.copy(partitions = c.partitions + (t -> p.split(",").map(_.toInt).toSeq))
        case "-o" => val (t, o) = splitKv(args(i + 1)); i += 2
          c = c.copy(offsets = c.offsets + (t -> o))
        case "-m" => c = c.copy(metadataTimeoutMs = Some(args(i + 1).toLong)); i += 2
        case "-r" => c = c.copy(registryUrl = Some(args(i + 1))); i += 2
        case "-d" => c = c.copy(dbDir = Some(args(i + 1))); i += 2
        case "-F" => c = applyProps(c, args(i + 1)); i += 2
        case "-X" => val (k, v) = splitKv(args(i + 1)); i += 2
          c = c.copy(passthrough = c.passthrough + (k -> v))
        case "-j" => c = c.copy(jdbcPort = Some(args(i + 1).toInt)); i += 2
        case "-c" => c = c.copy(attachUrl = Some(args(i + 1))); i += 2
        case other => throw new IllegalArgumentException(s"unknown option $other")
      }
    }
    c
  }

  /** Build + run the engine for a parsed CLI on an existing session (does
    * not stop the session — main() owns that). Returns the engine with all
    * topic tables registered. */
  private[graft] def runWith(spark: SparkSession, c: Cli): Engine = {
    graft.functions.GraftFunctions.register(spark)
    // mock:// keeps the in-process registry (reference's mock scope);
    // http(s):// builds the REST client (reference: KwackConfig.java:59-63).
    val registry: graft.schema.SchemaRegistry = c.registryUrl match {
      case Some(u) if u.startsWith("http://") || u.startsWith("https://") =>
        new graft.schema.HttpSchemaRegistry(u)
      case Some(u) =>
        require(u.startsWith("mock://"),
          s"unsupported registry URL scheme: $u (expected http://, https://, or mock://)")
        new graft.schema.InMemorySchemaRegistry
      case None => new graft.schema.InMemorySchemaRegistry
    }
    c.passthrough.collect { case (k, v) if k.startsWith("spark.") =>
      spark.conf.set(k, v)
    }
    val kafkaExtra = c.passthrough.collect {
      case (k, v) if k.startsWith("kafka.") => k -> v
    } ++ c.metadataTimeoutMs.map(t => "kafka.default.api.timeout.ms" -> t.toString)

    val engine = new Engine(spark, registry)
    val specs = c.topics.map { case (topic, _) =>
      Engine.TopicSpec(topic,
        keySerde = c.keySerdes.getOrElse(topic, Serde.BinarySerde),
        valueSerde = c.valueSerdes.getOrElse(topic, Serde.Latest),
        rowAttrs = c.rowAttrs, skipBytes = c.skipBytes)
    }
    val fileByTopic = c.topics.collect { case (t, Some(f)) => t -> f }.toMap
    def dbTable(topic: String): Option[String] =
      c.dbDir.map(d => s"$d/${Engine.sanitize(topic)}.parquet")
        .filter(p => new java.io.File(p).exists())

    def source(spec: Engine.TopicSpec): DataFrame =
      fileByTopic.get(spec.topic) match {
        case Some(file) => spark.read.parquet(file)
        case None => KafkaRecords.read(spark,
          c.brokers.getOrElse(throw new IllegalArgumentException(
            s"no -b brokers, no =file source, and no -d db table for topic ${spec.topic}")),
          spec.topic,
          c.partitions.getOrElse(spec.topic, Nil),
          c.offsets.getOrElse(spec.topic, "beginning"),
          kafkaExtra)
      }

    // restore-from-db topics bypass decode (they were decoded when saved);
    // everything else goes through the normal ingest path. init first —
    // it replaces the engine's spec/table maps — then merge restores in.
    val (restored, fresh) = specs.partition(s => dbTable(s.topic).isDefined)
    if (fresh.nonEmpty) engine.init(fresh, source)
    restored.foreach { s =>
      engine.registerDecoded(s, spark.read.parquet(dbTable(s.topic).get))
    }

    // persist freshly-decoded tables for next run (reference -d semantics)
    c.dbDir.foreach { d =>
      new java.io.File(d).mkdirs()
      fresh.foreach { s =>
        val view = Engine.sanitize(s.topic)
        spark.table(view).write.mode("overwrite").parquet(s"$d/$view.parquet")
      }
    }
    engine
  }

  def main(args: Array[String]): Unit = {
    val c = parse(args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "30000")
      // static conf, set before session build: JDBC sessions on the -j
      // thrift endpoint share this session's temp views (topic tables)
      .config("spark.sql.hive.thriftServer.singleSession", "true")
      // native functions, the AS-OF planner strategy, and the
      // full-dialect parser front for the -j attach surface
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val engine = runWith(spark, c)
    // external SQL-client attach surface (reference parity: kwack serves
    // sqlline over a second JDBC connection, KwackEngine.java:258-272)
    c.jdbcPort.foreach { p =>
      val bound = graft.server.JdbcServe.start(engine, p)
      println(s"JDBC endpoint: jdbc:hive2://localhost:$bound/default")
    }
    c.query match {
      case Some(q) => engine.query(q).foreach(println)
      case None => repl(engine, None, c.attachUrl)
    }
    c.jdbcPort.foreach(_ => graft.server.JdbcServe.stop())
    spark.stop()
  }

  /** SQL REPL with line editing, persistent history, column-aligned output
    * and sqlline-style `!` commands — the reference's interactive surface
    * (sqlline over JDBC, KwackApplication.java:16-35; KwackEngine.java:
    * 258-272) re-expressed on the JLine that ships with Spark.
    *
    * Commands: `!help`, `!tables`, `!describe <t>`, `!history`,
    * `!rows <n>` (display row cap), `quit`/`exit`/`!quit`. SQL statements
    * run through the full engine dialect (one per line, `;` optional) and
    * print as an aligned table with a `N rows selected (T seconds)` footer.
    *
    * The Spark-native equivalent of the reference's remote-JDBC surface is
    * Spark Connect / the Thrift JDBC server: because the engine registers
    * every decoded topic as a view on the shared SparkSession, starting
    * `sbin/start-thriftserver.sh` (or a Connect endpoint) against the same
    * session serves these views to any JDBC/BI client with zero engine
    * changes. */
  private[graft] def repl(engine: Engine): Unit = repl(engine, None, None)

  private[graft] def repl(engine: Engine,
      io: Option[(java.io.InputStream, java.io.OutputStream)]): Unit =
    repl(engine, io, None)

  /** `io`: explicit (in, out) streams for scripted/automated runs (the
    * JLine system terminal binds the real file descriptors, so a spec
    * cannot drive it by swapping `System.in`); None = the user's TTY.
    * `attachUrl`: start attached to a remote thrift endpoint (`-c`) —
    * statements execute over hive-jdbc instead of the local engine, the
    * inverse of `-j` and the reference's sqlline second-connection
    * attach (KwackEngine.java:258-272). `!connect <url>` / `!detach`
    * switch modes at runtime. */
  private[graft] def repl(engine: Engine,
      io: Option[(java.io.InputStream, java.io.OutputStream)],
      attachUrl: Option[String]): Unit = {
    import org.jline.reader.{EndOfFileException, LineReader, LineReaderBuilder, UserInterruptException}
    import org.jline.terminal.TerminalBuilder
    val terminal = io match {
      // explicit DumbTerminal: TerminalBuilder.streams() would wrap the
      // streams in a pty pump whose pump thread races a fast scripted
      // input to EOF; the dumb terminal reads the stream directly
      case Some((i, o)) => new org.jline.terminal.impl.DumbTerminal(i, o)
      case None => TerminalBuilder.builder().system(true).dumb(true).build()
    }
    val histFile = java.nio.file.Path.of(
      System.getProperty("user.home", "."), ".graft_history")
    val reader = LineReaderBuilder.builder()
      .terminal(terminal)
      .variable(LineReader.HISTORY_FILE, histFile)
      .build()
    var maxRows = 100
    var done = false
    var remote: Option[(String, java.sql.Connection)] = None
    def connectRemote(url: String): Unit = {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      remote.foreach { case (_, c) => try c.close() catch { case _: Exception => () } }
      remote = Some((url,
        java.sql.DriverManager.getConnection(url, "anonymous", "")))
      println(s"connected: $url (statements now run remotely; !detach to return)")
    }
    attachUrl.foreach { u =>
      try connectRemote(u)
      catch { case e: Exception =>
        System.err.println(s"error: could not attach to $u: ${e.getMessage}") }
    }
    while (!done) {
      val line =
        try reader.readLine("graft> ")
        catch {
          case _: EndOfFileException => null
          case _: UserInterruptException => "" // Ctrl-C clears the line
        }
      if (line == null) done = true
      else {
        val stmt = line.trim.stripSuffix(";").trim
        stmt.toLowerCase match {
          case "" =>
          case "quit" | "exit" | "!quit" | "\\q" => done = true
          case "!help" =>
            println("""!tables            list registered tables/views
                      |!describe <table>  show a table's schema
                      |!history           show command history
                      |!rows <n>          set the display row cap (default 100)
                      |!connect <url>     attach to a remote thrift endpoint (hive-jdbc)
                      |!detach            return to the local engine
                      |quit | exit        leave""".stripMargin)
          case "!tables" =>
            engine.spark.catalog.listTables().collect()
              .map(_.name).sorted.foreach(println)
          case "!history" =>
            reader.getHistory.iterator().forEachRemaining(e =>
              println(f"${e.index() + 1}%5d  ${e.line()}"))
          case cmd if cmd.startsWith("!describe") =>
            try engine.spark.table(stmt.split("\\s+")(1)).printSchema()
            catch { case e: Exception => System.err.println(s"error: ${e.getMessage}") }
          case cmd if cmd.startsWith("!rows") =>
            try { maxRows = stmt.split("\\s+")(1).toInt; println(s"display cap: $maxRows") }
            catch { case _: Exception => System.err.println("usage: !rows <n>") }
          case cmd if cmd.startsWith("!connect") =>
            stmt.split("\\s+").lift(1) match {
              case Some(url) =>
                try connectRemote(url)
                catch { case e: Exception =>
                  System.err.println(s"error: ${e.getMessage}") }
              case None => System.err.println("usage: !connect <jdbc:hive2://...>")
            }
          case "!detach" =>
            remote match {
              case Some((url, c)) =>
                try c.close() catch { case _: Exception => () }
                remote = None
                println(s"detached from $url")
              case None => System.err.println("not attached")
            }
          case cmd if cmd.startsWith("!") =>
            System.err.println(s"unknown command $stmt (try !help)")
          case _ =>
            try {
              val t0 = System.nanoTime()
              val (cols, fetched, updateCount) = remote match {
                case Some((_, conn)) => execRemote(conn, stmt, maxRows + 1)
                case None =>
                  val df = engine.sql(stmt)
                  // one execution: fetch cap+1 rows to detect truncation
                  (df.columns, df.limit(maxRows + 1).collect(), None)
              }
              val secs = (System.nanoTime() - t0) / 1e9
              updateCount match {
                case Some(n) =>
                  println(f"$n row${if (n == 1L) "" else "s"} affected ($secs%.3f seconds)")
                case None =>
                  val truncated = fetched.length > maxRows
                  val rows = fetched.take(maxRows)
                  renderTable(cols, rows)
                  val n = rows.length
                  val count = if (truncated) s"first $n" else n.toString
                  println(f"$count row${if (n == 1) "" else "s"} selected ($secs%.3f seconds)")
              }
            } catch {
              case e: Exception => System.err.println(s"error: ${e.getMessage}")
            }
        }
      }
    }
    remote.foreach { case (_, c) => try c.close() catch { case _: Exception => () } }
    terminal.close()
  }

  /** Execute a statement over an attached hive-jdbc connection: result
    * sets come back as rendered rows (capped at `fetchMax`), non-query
    * statements as an update count. */
  private[graft] def execRemote(conn: java.sql.Connection, stmt: String,
      fetchMax: Int): (Array[String], Array[org.apache.spark.sql.Row], Option[Long]) = {
    val st = conn.createStatement()
    try {
      if (st.execute(stmt)) {
        val rs = st.getResultSet
        val md = rs.getMetaData
        val cols = (1 to md.getColumnCount).map(md.getColumnLabel).toArray
        val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        while (buf.length < fetchMax && rs.next())
          buf += org.apache.spark.sql.Row.fromSeq(
            (1 to cols.length).map(rs.getObject))
        (cols, buf.toArray, None)
      } else (Array.empty[String], Array.empty[org.apache.spark.sql.Row],
        Some(st.getUpdateCount.toLong))
    } finally st.close()
  }

  /** sqlline-style column-aligned rendering: `+---+` borders, headers,
    * cells stringified with SQL NULL, no truncation (the row cap bounds
    * output instead). */
  private[graft] def renderTable(cols: Array[String],
                                 rows: Array[org.apache.spark.sql.Row]): Unit = {
    def cell(v: Any): String = v match {
      case null => "NULL"
      case b: Array[Byte] => "0x" + b.map("%02x".format(_)).mkString
      case s: Seq[_] => s.map(cell).mkString("[", ", ", "]")
      case m: Map[_, _] =>
        m.map { case (k, v) => s"${cell(k)} -> ${cell(v)}" }.mkString("{", ", ", "}")
      case other => String.valueOf(other)
    }
    val table = rows.map(r => cols.indices.map(i => cell(r.get(i))))
    val widths = cols.indices.map { i =>
      (cols(i).length +: table.map(_(i).length)).max
    }
    val border = widths.map("-" * _).mkString("+-", "-+-", "-+")
    def fmtRow(vals: Seq[String]): String =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }
        .mkString("| ", " | ", " |")
    println(border)
    println(fmtRow(cols.toSeq))
    println(border)
    table.foreach(r => println(fmtRow(r)))
    println(border)
  }
}
