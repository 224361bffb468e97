package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-asset build-cost measurement (VERDICT r10 task 5): the category-4
  * paired-bench flags ("build-once amortization") rest on the claim that a
  * query's first run pays a reusable asset — shingle postings, minhash
  * signature chains, LSH band stores, IVF centroids, simhash frames — that
  * every later query against the same corpus reuses. This tool makes that
  * cost a MEASURED number per asset and scale: for each asset's
  * owner query it times a first run (builds the asset) and a second run
  * (reuses it); `build_est = first - steady` is the amortized cost, an
  * upper bound that also contains first-run plan compile/JIT (noted in
  * BASELINE.md alongside the table).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.tools.AssetCost"
  * Prints one JSON line per asset. Run on a QUIET host (bench hygiene). */
object AssetCost {
  /** asset name -> (owner query, gated queries served by the asset). */
  private val assets: Seq[(String, String, Seq[String])] = Seq(
    ("shingle-postings", "d02_dedup_jaccard",
      Seq("d02", "d13", "d16", "d23")),
    ("minhash-sig-chain", "d03_dedup_minhash_lsh",
      Seq("d03", "d06", "d24", "d27")),
    ("lsh-band-store", "d27_lsh_store", Seq("d27", "d32")),
    ("ivf-centroids", "s04_knn_ivf_trained",
      Seq("s04", "s06", "s13", "s19")),
    // owner is the CERTIFICATE twin: it builds the identical memoized
    // signature frame without d04's output-bound pair enumeration (which
    // at sf10 is a 635 s / 3.11 B-row diagnostic — not an asset build)
    ("simhash-sig-frame", "d40_simhash_cert", Seq("d04", "d40")),
    ("bbit-minhash-sketch", "d37_bbit_minhash", Seq("d37")),
    ("source-minhash-sketch", "d38_source_minhash", Seq("d38")),
    ("oph-sketch", "d39_oph_sketch", Seq("d39")),
    ("suffix-gram-store", "x40_source_overlap", Seq("x40")),
    ("asof-sorted-frame", "q81_asof_sql", Seq("q81", "q98", "q99")),
    ("knn-graph-edges", "s18_graph_centrality", Seq("s18", "s30")))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "100000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    // absorb session bring-up + first-read codegen so the first asset's
    // first_s is the asset build, not the JVM warmup
    Seq("q01_agg_pricing", "x01_token_count", "s01_knn_brute").foreach { w =>
      graft.SparkEntry.queries(w)(spark, sfDir).count()
    }

    val only = if (args.nonEmpty) args.toSet else assets.map(_._1).toSet
    assets.filter(a => only.contains(a._1)).foreach {
      case (asset, owner, serves) =>
        graft.SparkEntry.queries.get(owner) match {
          case None => println(s"""{"asset":"$asset","err":"no query $owner"}""")
          case Some(fn) =>
            def once(): Double = {
              val t0 = System.nanoTime()
              fn(spark, sfDir).count()
              (System.nanoTime() - t0) / 1e9
            }
            val first = once()
            val steady = math.min(once(), once())
            // Locale.ROOT: default-locale %.3f prints "0,123" on
            // comma-decimal locales — invalid JSON lines
            def fmt(v: Double): String =
              String.format(java.util.Locale.ROOT, "%.3f",
                java.lang.Double.valueOf(v))
            println(s"""{"asset":"$asset","owner":"$owner","sf":"$sfDir",""" +
              s""""first_s":${fmt(first)},"steady_s":${fmt(steady)},""" +
              s""""build_est_s":${fmt(math.max(0.0, first - steady))},""" +
              s""""serves":[${serves.map("\"" + _ + "\"").mkString(",")}]}""")
        }
    }
    spark.stop()
  }
}
