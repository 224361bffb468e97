package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an sf1 corpus as a 10x replication of sf0.1 with re-keyed
  * ids (VERDICT r3 item 7: one more decade of scaling evidence).
  *
  * Every key column is shifted by copy*STRIDE so primary keys stay unique
  * and foreign keys stay consistent within a copy (joins match exactly the
  * rows they matched at sf0.1, replicated 10x). Non-key payloads are left
  * identical — at bench scale that is the realistic shape for dedup
  * workloads (documents gain 10 exact duplicates each, which is what a
  * crawl corpus looks like) and timing-neutral for everything else.
  * region/nation are fixed dimensions and copied once.
  */
object MakeSf1 {
  private val Stride = 100000000L // > any sf0.1 key, keeps ids disjoint

  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    // events is handled by tools/make_sf1_events.py: its ts column is
    // parquet TIMESTAMP(NANOS), which Spark can neither read natively nor
    // write back — DuckDB replicates it with the physical type preserved
    // so the oracle replay sees the same schema at every sf
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/root/repo/testdata_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    // optional table subset (round 8: sf10 needs only the corpus tables
    // the corpus-proportional worst cases read — documents, embeddings)
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet)
      else None
    def wanted(t: String) = only.forall(_.contains(t))
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame, keys: Seq[String]): DataFrame = {
      val shifted = (0 until copies).map { i =>
        keys.foldLeft(df) { (d, k) =>
          d.withColumn(k, col(k) + lit(i * Stride))
        }
      }
      shifted.reduce(_ unionAll _)
    }

    Seq("region", "nation").filter(wanted).foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"$t: copied")
    }
    keyCols.filter(kv => wanted(kv._1)).foreach { case (t, keys) =>
      val src = spark.read.parquet(s"$srcDir/$t.parquet")
      val out = replicate(src, keys)
      out.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      val n = spark.read.parquet(s"$outDir/$t.parquet").count()
      println(s"$t: $n rows")
    }
    spark.stop()
  }
}
