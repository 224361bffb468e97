package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.serde.Serde
import graft.sources.KafkaRecords

/** CLI entry point mirroring the reference's surface (reference:
  * KwackMain.java:49-138):
  *
  * {{{
  * graft.Main [-t topic[=records.parquet]]... [-k topic=serde]...
  *            [-v topic=serde]... [-a attrs] [-q query] [-s skipBytes]
  *            [-b bootstrapServers] [-p topic=0,1,2] [-o topic=offsetSpec]
  * }}}
  *
  * Record source: with `-b`, each topic is a batch Kafka read (consume to
  * current end, the reference's snapshot semantics); with `-t topic=file`,
  * records come from a parquet file in the Kafka record schema (offline /
  * test mode). With `-q` the query runs once and rows print as JSON lines
  * (reference: KwackMain.java:157-163); otherwise an interactive REPL reads
  * SQL statements from stdin (reference: KwackEngine.java:258-272).
  */
object Main {
  def main(args: Array[String]): Unit = {
    var topics = Vector.empty[(String, Option[String])]
    var keySerdes = Map.empty[String, Serde]
    var valueSerdes = Map.empty[String, Serde]
    var rowAttrs: Set[String] = Engine.defaultRowAttrs
    var query: Option[String] = None
    var skipBytes = 0
    var brokers: Option[String] = None
    var partitions = Map.empty[String, Seq[Int]]
    var offsets = Map.empty[String, String]

    def splitKv(s: String): (String, String) = {
      val i = s.indexOf('=')
      require(i > 0, s"expected key=value, got: $s")
      (s.substring(0, i), s.substring(i + 1))
    }

    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-t" =>
          val v = args(i + 1); i += 2
          val eq = v.indexOf('=')
          topics :+= (if (eq > 0) (v.substring(0, eq), Some(v.substring(eq + 1)))
            else (v, None))
        case "-k" => val (t, s) = splitKv(args(i + 1)); i += 2
          keySerdes += t -> Serde.parse(s)
        case "-v" => val (t, s) = splitKv(args(i + 1)); i += 2
          valueSerdes += t -> Serde.parse(s)
        case "-a" => rowAttrs = args(i + 1).split(",").filter(_.nonEmpty).toSet; i += 2
        case "-q" => query = Some(args(i + 1)); i += 2
        case "-s" => skipBytes = args(i + 1).toInt; i += 2
        case "-b" => brokers = Some(args(i + 1)); i += 2
        case "-p" => val (t, p) = splitKv(args(i + 1)); i += 2
          partitions += t -> p.split(",").map(_.toInt).toSeq
        case "-o" => val (t, o) = splitKv(args(i + 1)); i += 2
          offsets += t -> o
        case other => throw new IllegalArgumentException(s"unknown option $other")
      }
    }

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val engine = new Engine(spark)
    val specs = topics.map { case (topic, _) =>
      Engine.TopicSpec(topic,
        keySerde = keySerdes.getOrElse(topic, Serde.BinarySerde),
        valueSerde = valueSerdes.getOrElse(topic, Serde.Latest),
        rowAttrs = rowAttrs, skipBytes = skipBytes)
    }
    val fileByTopic = topics.collect { case (t, Some(f)) => t -> f }.toMap
    def source(spec: Engine.TopicSpec): DataFrame =
      fileByTopic.get(spec.topic) match {
        case Some(file) => spark.read.parquet(file)
        case None => KafkaRecords.read(spark,
          brokers.getOrElse(throw new IllegalArgumentException(
            s"no -b brokers and no =file source for topic ${spec.topic}")),
          spec.topic,
          partitions.getOrElse(spec.topic, Nil),
          offsets.getOrElse(spec.topic, "beginning"))
      }
    if (specs.nonEmpty) engine.init(specs, source)

    query match {
      case Some(q) => engine.query(q).foreach(println)
      case None => repl(engine)
    }
    spark.stop()
  }

  /** Minimal SQL REPL: one statement per line, `quit`/`exit` to leave. */
  private def repl(engine: Engine): Unit = {
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
    print("graft> "); Console.flush()
    var line = in.readLine()
    while (line != null && !Set("quit", "exit", "\\q").contains(line.trim.toLowerCase)) {
      val stmt = line.trim
      if (stmt.nonEmpty) {
        try engine.sql(stmt).show(100, truncate = false)
        catch { case e: Exception => System.err.println(s"error: ${e.getMessage}") }
      }
      print("graft> "); Console.flush()
      line = in.readLine()
    }
  }
}
