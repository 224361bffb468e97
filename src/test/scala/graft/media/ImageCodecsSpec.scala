package graft.media

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ImageCodecsSpec extends AnyFunSuite with Matchers {
  import ImageCodecs._

  private def pixels(n: Int, seed: Long): Array[Byte] =
    Array.tabulate(n)(i => ((i.toLong * 7 + seed) % 251).toByte)

  // widths chosen so BMP row stride padding hits all four remainders
  private val shapes = Seq((1, 1), (3, 2), (4, 4), (5, 7), (6, 3), (63, 47))

  test("BMP round-trips row-major RGB through bottom-up BGR padded layout") {
    for ((w, h) <- shapes) {
      val px = pixels(w * h * 3, w * 100 + h)
      val bytes = encodeBmp(w, h, px)
      bytes.length shouldBe 54 + ((w * 3 + 3) / 4 * 4) * h
      val img = decodeBmp(bytes)
      (img.width, img.height) shouldBe (w, h)
      img.rgb shouldBe px
    }
  }

  test("PNG round-trips through zlib IDAT and all five filter types") {
    for ((w, h) <- shapes) {
      val px = pixels(w * h * 3, w * 31 + h)
      val img = decodePng(encodePng(w, h, px))
      (img.width, img.height) shouldBe (w, h)
      img.rgb shouldBe px
    }
  }

  test("palette PNG round-trips indices through PLTE + 1-byte-stride " +
      "filters to the palette-resolved RGB") {
    for ((w, h) <- shapes) {
      val k = 2 + (w + h) % 15 // 2..16 palette entries
      val palette = Array.tabulate(k * 3)(i => ((i * 53 + 7) % 256).toByte)
      val idx = Array.tabulate(w * h)(p => ((p * 11 + w) % k).toByte)
      val bytes = encodePngPalette(w, h, idx, palette)
      pngPaletteSize(bytes) shouldBe k
      val img = decodePng(bytes)
      (img.width, img.height) shouldBe (w, h)
      val expected = idx.flatMap { b =>
        val j = b & 0xff
        Seq(palette(j * 3), palette(j * 3 + 1), palette(j * 3 + 2))
      }
      img.rgb shouldBe expected
    }
    // a truecolor PNG reports no palette
    pngPaletteSize(encodePng(4, 4, pixels(48, 3))) shouldBe -1
  }

  test("palette PNG rejects an out-of-range index and a corrupted PLTE CRC") {
    val palette = Array.tabulate(9)(i => (i * 10).toByte) // 3 entries
    an[IllegalArgumentException] should be thrownBy
      encodePngPalette(2, 2, Array[Byte](0, 1, 3, 2), palette)
    val ok = encodePngPalette(2, 2, Array[Byte](0, 1, 2, 1), palette)
    // PLTE chunk starts after sig(8) + IHDR(12+13); flip a palette byte
    ok(8 + 25 + 8 + 1) = (ok(8 + 25 + 8 + 1) ^ 0x01).toByte
    an[IllegalArgumentException] should be thrownBy decodePng(ok)
  }

  test("PNG rejects a corrupted chunk CRC") {
    val bytes = encodePng(5, 5, pixels(75, 9))
    // flip one bit inside the IDAT payload (after sig+IHDR chunk = 8+25)
    bytes(40) = (bytes(40) ^ 0x01).toByte
    an[IllegalArgumentException] should be thrownBy decodePng(bytes)
  }

  test("decoders reject foreign or truncated payloads") {
    an[IllegalArgumentException] should be thrownBy
      decodeBmp("not an image at all".getBytes)
    an[IllegalArgumentException] should be thrownBy
      decodePng("not an image at all either".getBytes)
    val truncated = encodeBmp(4, 4, pixels(48, 1)).take(60)
    an[IllegalArgumentException] should be thrownBy decodeBmp(truncated)
  }

  test("decode dispatches on container magic") {
    val px = pixels(4 * 3 * 3, 5)
    decode(encodeBmp(4, 3, px)).rgb shouldBe px
    decode(encodePng(4, 3, px)).rgb shouldBe px
  }

  test("nearest-neighbor resize uses the floor index mapping") {
    // 2x2 -> 4x4: each source pixel becomes a 2x2 block
    val px = Array.tabulate(2 * 2 * 3)(i => i.toByte)
    val out = resizeNearest(Image(2, 2, px), 4, 4)
    def at(img: Image, x: Int, y: Int): Seq[Byte] = {
      val o = (y * img.width + x) * 3
      img.rgb.slice(o, o + 3).toSeq
    }
    at(out, 0, 0) shouldBe at(Image(2, 2, px), 0, 0)
    at(out, 1, 1) shouldBe at(Image(2, 2, px), 0, 0)
    at(out, 2, 0) shouldBe at(Image(2, 2, px), 1, 0)
    at(out, 3, 3) shouldBe at(Image(2, 2, px), 1, 1)
    // downscale 4x4 -> 2x2 picks rows/cols 0 and 2
    val px4 = Array.tabulate(4 * 4 * 3)(i => i.toByte)
    val dn = resizeNearest(Image(4, 4, px4), 2, 2)
    at(dn, 1, 1) shouldBe at(Image(4, 4, px4), 2, 2)
  }
}
