package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level unit coverage for the image header walker — round-trip
  * against the synthesizer for all three formats, hand-built headers
  * pinning the grammar details a fixed-offset "parser" would get wrong
  * (JPEG segment walk, GIF little-endianness, PNG color types), and
  * malformed-input degradation (None, never a throw). */
class ImageHeadersSpec extends AnyFunSuite {

  test("synth images round-trip dims, depth, channels for all formats") {
    (1L to 200L).filter(_ % 31 != 0).foreach { id =>
      val got = ImageHeaders.parseHeader(id, ImageHeaders.synthImage(id))
        .getOrElse(fail(s"id $id did not parse"))
      val w = (64 + (id * 7) % 1000).toInt
      val h = (48 + (id * 11) % 800).toInt
      assert(got.width == w && got.height == h, s"dims of $id")
      (id % 3) match {
        case 0 =>
          assert(got.fmt == "jpeg" && got.depth == 8)
          assert(got.ncomp == (if (id % 5 == 0) 1 else 3))
          assert(got.hdr_bytes == 2 + 18 + 69 + 2 + 8 + 3 * got.ncomp)
        case 1 =>
          assert(got.fmt == "png")
          assert(got.depth == (if (id % 2 == 0) 8 else 16))
          assert(got.ncomp == Seq(1, 3, 4)(((id % 9) / 3).toInt))
          assert(got.hdr_bytes == 33)
        case _ =>
          assert(got.fmt == "gif" && got.depth == (id % 7) + 1 && got.ncomp == 1)
          assert(got.hdr_bytes == 13)
      }
    }
  }

  test("truncated 1-in-31 payloads degrade to None for every format") {
    // 0 jpeg, 31 png, 93 gif — one truncated id per format
    Seq(0L, 31L, 93L).foreach { id =>
      assert(ImageHeaders.parseHeader(id, ImageHeaders.synthImage(id)).isEmpty,
        s"truncated id $id must not parse")
    }
  }

  test("JPEG dims are found by WALKING segments, not at a fixed offset") {
    // Hand-build a JPEG whose SOF sits after an unusually long COM
    // segment — a parser assuming the synth layout's offsets would
    // misread. Also exercise fill bytes before the SOF marker.
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val com = Array[Byte](0xff.toByte, 0xfe.toByte) ++ be16(2 + 300) ++
      new Array[Byte](300)
    val sof = Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0xc2.toByte) ++
      be16(8 + 3) ++ Array[Byte](12) ++ be16(1234) ++ be16(4321) ++
      Array[Byte](1, 1, 0x11, 0)
    val p = Array[Byte](0xff.toByte, 0xd8.toByte) ++ com ++ sof
    val got = ImageHeaders.parseHeader(9L, p).getOrElse(fail("no parse"))
    assert(got.width == 4321 && got.height == 1234)
    assert(got.depth == 12 && got.ncomp == 1 && got.fmt == "jpeg")
  }

  test("JPEG stops at SOS or EOI without a frame header") {
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val sos = Array[Byte](0xff.toByte, 0xda.toByte) ++ be16(8) ++
      Array[Byte](1, 1, 0, 0, 63, 0)
    val eoiOnly = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)
    assert(ImageHeaders.parseHeader(1L,
      Array[Byte](0xff.toByte, 0xd8.toByte) ++ sos ++ new Array[Byte](32)).isEmpty)
    assert(ImageHeaders.parseHeader(1L, eoiOnly).isEmpty)
  }

  test("GIF dims are little-endian; depth unpacks from flags bits 6-4") {
    val p = "GIF87a".getBytes ++
      Array[Byte](0x34, 0x12, 0x78, 0x56) ++ // w=0x1234, h=0x5678 LE
      Array[Byte](((5 << 4) | 0x87).toByte, 0, 0)
    val got = ImageHeaders.parseHeader(2L, p).getOrElse(fail("no parse"))
    assert(got.width == 0x1234 && got.height == 0x5678)
    assert(got.depth == 6) // bits 6-4 = 5 (other flag bits set must not leak in)
  }

  test("PNG color types map to channel counts; unknown type degrades") {
    def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def png(colorType: Int): Array[Byte] =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++
        Array[Byte](8, colorType.toByte, 0, 0, 0) ++ be32(0)
    assert(ImageHeaders.parseHeader(1L, png(0)).get.ncomp == 1)
    assert(ImageHeaders.parseHeader(1L, png(2)).get.ncomp == 3)
    assert(ImageHeaders.parseHeader(1L, png(3)).get.ncomp == 1)
    assert(ImageHeaders.parseHeader(1L, png(4)).get.ncomp == 2)
    assert(ImageHeaders.parseHeader(1L, png(6)).get.ncomp == 4)
    assert(ImageHeaders.parseHeader(1L, png(7)).isEmpty)
  }

  test("malformed input never throws across random prefixes and noise") {
    val rnd = new scala.util.Random(42)
    (0 until 300).foreach { _ =>
      val noise = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      ImageHeaders.parseHeader(0L, noise) // must not throw
    }
    (1L to 40L).foreach { id =>
      val full = ImageHeaders.synthImage(id)
      (0 to full.length by 3).foreach { cut =>
        ImageHeaders.parseHeader(id, full.take(cut)) // must not throw
      }
    }
  }
}
