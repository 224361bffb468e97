package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.media.ImageCodecs

/** Round-10 wave-6 invariants: q126 INSERT BY NAME, m33 Adam7 interlaced
  * PNG decode, d38 source-level mergeable minhash. */
class NewOpsR10fSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("Adam7 round-trip: interlaced encode -> decode is bit-identical to " +
      "the source raster for every (w, h) shape class incl. tiny images") {
    // shapes exercise empty passes (w or h < 5), odd dims, and the 8x8 tile
    val shapes = Seq((1, 1), (2, 3), (3, 2), (4, 4), (5, 7), (7, 5),
      (8, 8), (9, 10), (16, 16), (13, 27), (63, 47))
    shapes.foreach { case (w, h) =>
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 251).toByte)
      val png = ImageCodecs.encodePngInterlaced(w, h, rgb)
      val img = ImageCodecs.decode(png)
      withClue(s"${w}x$h") {
        img.width shouldBe w
        img.height shouldBe h
        img.rgb.toSeq shouldBe rgb.toSeq
      }
    }
  }

  test("interlaced and non-interlaced encodings of the same raster decode " +
      "identically, and the interlaced container really declares Adam7") {
    val (w, h) = (21, 14)
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 7 + 3) % 251).toByte)
    val plain = ImageCodecs.decode(ImageCodecs.encodePng(w, h, rgb))
    val inter = ImageCodecs.decode(ImageCodecs.encodePngInterlaced(w, h, rgb))
    inter.rgb.toSeq shouldBe plain.rgb.toSeq
    // IHDR byte 12 (interlace method) sits at offset 8(sig)+8(hdr)+12
    ImageCodecs.encodePngInterlaced(w, h, rgb)(8 + 8 + 12) shouldBe 1.toByte
    ImageCodecs.encodePng(w, h, rgb)(8 + 8 + 12) shouldBe 0.toByte
  }

  test("INSERT BY NAME: any column order binds by name, unmentioned " +
      "columns fill NULL, unknown/duplicate names and column lists reject") {
    val e = new Engine(spark)
    try {
      e.sql("CREATE OR REPLACE TABLE bn (a BIGINT, b VARCHAR, c DOUBLE)")
      e.sql("INSERT INTO bn BY NAME SELECT 1.5 AS c, 7 AS a")
      val r = e.sql("SELECT a, b, c FROM bn").collect()(0)
      r.getLong(0) shouldBe 7L
      r.isNullAt(1) shouldBe true
      r.getDouble(2) shouldBe 1.5
      // case-insensitive binding
      e.sql("INSERT INTO bn BY NAME SELECT 'x' AS B, 9 AS A")
      e.sql("SELECT b FROM bn WHERE a = 9").collect()(0)
        .getString(0) shouldBe "x"
      intercept[Exception](
        e.sql("INSERT INTO bn BY NAME SELECT 1 AS nope"))
        .getMessage should include("no column 'nope'")
      intercept[Exception](
        e.sql("INSERT INTO bn BY NAME SELECT 1 AS a, 2 AS A"))
        .getMessage should include("duplicate")
      intercept[Exception](
        e.sql("INSERT INTO bn (a) BY NAME SELECT 1 AS a"))
        .getMessage should include("column list")
    } finally e.close()
  }

  test("d38 source minhash is MERGEABLE: the source signature equals the " +
      "component-wise min of its docs' signatures computed independently") {
    val rows = SparkEntry.queries("d38_source_minhash")(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val agree = r.getInt(2)
      agree should (be >= 0 and be <= 8)
      r.getLong(3) shouldBe agree * 125L
      r.getLong(5) shouldBe math.abs(r.getLong(3) - r.getLong(4))
    }
    // independent plain-Scala recompute of one source pair's exact jaccard
    val docs = Tables.load(spark, sf, "documents")
      .select(col("source"), split(col("text"), " ").as("w"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[String](1)))
      .filter(_._2.length >= 3)
    def shingleSet(src: String): Set[String] = docs.filter(_._1 == src)
      .flatMap(_._2.sliding(3).map(_.mkString(" "))).toSet
    val first = rows.head
    val (s1, s2) = (first.getString(0), first.getString(1))
    val (a, b) = (shingleSet(s1), shingleSet(s2))
    val inter = (a & b).size.toLong
    first.getLong(4) shouldBe (1000L * inter) / (a.size + b.size - inter)
  }
}
