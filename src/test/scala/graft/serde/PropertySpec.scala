package graft.serde

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.AvroDecoders
import graft.schema.{AvroSchemaCompiler, InMemorySchemaRegistry}

/** Property-based round-trips: arbitrary values through frame + decode. */
class PropertySpec extends AnyFunSuite with Matchers {

  /** Deterministic sampling of a scalacheck generator (the
    * scalatest/scalacheck bridge artifact is not in the offline cache). */
  private def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)).foreach(f)
    }

  test("wire format frames round-trip for arbitrary ids/payloads/indexes") {
    val gen = for {
      id <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      payload <- Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
      idx <- Gen.oneOf(Gen.const(Seq.empty[Int]),
        Gen.nonEmptyListOf(Gen.chooseNum(0, 1 << 20)).map(_.take(5).toSeq))
    } yield (id, payload, idx)
    forAll(gen) { case (id, payload, idx) =>
      val framed = WireFormat.frame(id, payload, idx)
      val parsed = WireFormat.parse(framed, 0, withIndexes = idx.nonEmpty)
      parsed.schemaId shouldBe id
      if (idx.nonEmpty) {
        // single [0] has the compact one-byte form
        val expected = if (idx == Seq(0)) Seq(0) else idx
        parsed.messageIndexes shouldBe expected
      }
      val out = new Array[Byte](parsed.payload.remaining())
      parsed.payload.duplicate().get(out)
      out.toSeq shouldBe payload.toSeq
      WireFormat.schemaId(framed, 0) shouldBe Some(id)
    }
  }

  test("proto varint scalars round-trip across the full value range") {
    val text = """syntax = "proto3";
      |message P { int32 a = 1; int64 b = 2; uint32 c = 3; sint32 d = 4;
      |  sint64 e = 5; bool f = 6; string g = 7; }""".stripMargin
    val (dt, decode) = ProtoDecoders.make(text, None, 0)
    val st = dt.asInstanceOf[StructType]
    val gen = for {
      a <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      b <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      c <- Gen.chooseNum(0L, 0xffffffffL)
      d <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      e <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      f <- Gen.oneOf(true, false)
      g <- Gen.alphaNumStr
    } yield (a, b, c, d, e, f, g)
    forAll(gen) { case (a, b, c, d, e, f, g) =>
      val w = new W()
      w.tag(1, 0); w.varint(a.toLong) // int32: sign-extended varint
      w.tag(2, 0); w.varint(b)
      w.tag(3, 0); w.varint(c)
      w.tag(4, 0); w.varint((d.toLong << 1) ^ (d.toLong >> 63)) // zigzag32 as 64
      w.tag(5, 0); w.varint((e << 1) ^ (e >> 63))
      w.int(6, if (f) 1 else 0)
      w.str(7, g)
      val row = decode(w.bytes).asInstanceOf[Row]
      row.getInt(st.fieldIndex("a")) shouldBe a
      row.getLong(st.fieldIndex("b")) shouldBe b
      row.getLong(st.fieldIndex("c")) shouldBe c
      row.getInt(st.fieldIndex("d")) shouldBe d
      row.getLong(st.fieldIndex("e")) shouldBe e
      row.getBoolean(st.fieldIndex("f")) shouldBe f
      row.getString(st.fieldIndex("g")) shouldBe g
    }
  }

  test("avro records round-trip for arbitrary field values") {
    val schemaText =
      """{"type":"record","name":"P","fields":[
        |{"name":"s","type":"string"},
        |{"name":"i","type":"int"},
        |{"name":"l","type":"long"},
        |{"name":"d","type":"double"},
        |{"name":"by","type":"bytes"},
        |{"name":"opt","type":["null","string"],"default":null},
        |{"name":"arr","type":{"type":"array","items":"long"}},
        |{"name":"m","type":{"type":"map","values":"int"}}
        |]}""".stripMargin
    val schema = new Schema.Parser().parse(schemaText)
    val st = AvroSchemaCompiler.compile(schema).dataType.asInstanceOf[StructType]
    val reg = new InMemorySchemaRegistry
    val id = reg.register("p-value", "AVRO", schema.toString)
    val decode = AvroDecoders.make(schema.toString, st, reg, 0)

    val gen = for {
      s <- Gen.asciiPrintableStr
      i <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      l <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      d <- Gen.chooseNum(-1e300, 1e300)
      by <- Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
      opt <- Gen.option(Gen.alphaNumStr)
      arr <- Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
      m <- Gen.mapOf(Gen.zip(Gen.alphaNumStr, Gen.chooseNum(0, 1000)))
    } yield (s, i, l, d, by, opt, arr, m)

    forAll(gen) { case (s, i, l, d, by, opt, arr, m) =>
      val rec = new GenericData.Record(schema)
      rec.put("s", s); rec.put("i", i); rec.put("l", l); rec.put("d", d)
      rec.put("by", java.nio.ByteBuffer.wrap(by))
      rec.put("opt", opt.orNull)
      rec.put("arr", {
        val jl = new java.util.ArrayList[java.lang.Long]()
        arr.foreach(v => jl.add(Long.box(v)))
        jl
      })
      val jm = new java.util.HashMap[String, Integer]()
      m.foreach { case (k, v) => jm.put(k, v) }
      rec.put("m", jm)
      val out = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      new GenericDatumWriter[GenericData.Record](schema).write(rec, enc)
      enc.flush()
      val row = decode(WireFormat.frame(id, out.toByteArray)).asInstanceOf[Row]
      row.getString(st.fieldIndex("s")) shouldBe s
      row.getInt(st.fieldIndex("i")) shouldBe i
      row.getLong(st.fieldIndex("l")) shouldBe l
      row.getDouble(st.fieldIndex("d")) shouldBe d
      row.get(st.fieldIndex("by")).asInstanceOf[Array[Byte]].toSeq shouldBe by.toSeq
      Option(row.get(st.fieldIndex("opt"))) shouldBe opt
      row.get(st.fieldIndex("arr")).asInstanceOf[Seq[Long]] shouldBe arr
      row.get(st.fieldIndex("m")).asInstanceOf[Map[String, Int]] shouldBe m
    }
  }
}
