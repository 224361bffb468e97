package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property-style randomized cross-check of the four ASOF SQL directions:
  * on seeded pseudo-random (key, ts) data with deliberate duplicate
  * timestamps, the engine's rewrite (native sort-merge exec via the
  * epoch-micros axis reduction) must match a brute-force driver-side
  * reference for every direction. Duplicate (key, ts) rows on the right are
  * deduped first (the q34 determinism convention) so "the" neighbor is
  * well-defined in both implementations.
  */
class AsofDirectionPropertySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => (x * 6364136223846793005L + 1442695040888963407L))

  test("all four ASOF directions match a brute-force reference on random data") {
    import spark.implicits._
    val engine = new Engine(spark)
    try {
      (1 to 3).foreach { seed =>
        val rnd = lcg(seed * 7919L).drop(1)
        def next(mod: Int): Int = math.floorMod(rnd.next(), mod.toLong).toInt
        val lrows = (1 to 40).map { i =>
          (i.toLong, next(5).toLong, new java.sql.Timestamp(next(50) * 1000L))
        }
        val rrows0 = (1 to 40).map { i =>
          (100L + i, next(5).toLong, new java.sql.Timestamp(next(50) * 1000L),
            s"v$i")
        }
        // dedup right per (key, ts): keep the largest rid
        val rrows = rrows0.groupBy(r => (r._2, r._3.getTime))
          .map(_._2.maxBy(_._1)).toSeq
        lrows.toDF("lid", "k", "lts").createOrReplaceTempView("prop_l")
        rrows.toDF("rid", "k", "rts", "v").createOrReplaceTempView("prop_r")

        def reference(op: String): Map[Long, Option[Long]] = {
          val byKey = rrows.groupBy(_._2)
          lrows.map { case (lid, k, lts) =>
            val cands = byKey.getOrElse(k, Seq.empty).filter { r =>
              op match {
                case ">=" => lts.getTime >= r._3.getTime
                case ">"  => lts.getTime > r._3.getTime
                case "<=" => lts.getTime <= r._3.getTime
                case "<"  => lts.getTime < r._3.getTime
              }
            }
            val pick =
              if (op.startsWith(">")) // backward: latest at-or-before
                cands.sortBy(r => (-r._3.getTime, -r._1)).headOption
              else // forward: earliest at-or-after
                cands.sortBy(r => (r._3.getTime, -r._1)).headOption
            lid -> pick.map(_._1)
          }.toMap
        }

        Seq(">=", ">", "<=", "<").foreach { op =>
          val got = engine.sql(
            s"""SELECT l.lid, r.rid FROM prop_l l ASOF LEFT JOIN prop_r r
               |ON l.k = r.k AND l.lts $op r.rts""".stripMargin)
            .collect().map(r => r.getLong(0) ->
              (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
          withClue(s"seed=$seed op=$op:") { got shouldBe reference(op) }
        }
      }
    } finally engine.close()
  }
}
