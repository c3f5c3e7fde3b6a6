package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level unit coverage for the Ogg page walker — round-trip against
  * the synthesizer (multi-segment lacing incl. the 0-lacing terminator),
  * handcrafted cross-page packet continuation (out of the synth fixture's
  * scope by design), field extremes across the little-endian header
  * layout, and malformed-input degradation (partial index, never a throw
  * — the contract all four container walks share). */
class OggSpec extends AnyFunSuite {

  private def pageBytes(flags: Int, granule: Long, serial: Long, seq: Long,
                        laces: Seq[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = (0 until 4).foreach(k => bos.write(((v >> (8 * k)) & 0xff).toInt))
    bos.write('O'); bos.write('g'); bos.write('g'); bos.write('S')
    bos.write(0); bos.write(flags)
    (0 until 8).foreach(k => bos.write(((granule >> (8 * k)) & 0xff).toInt))
    w32(serial); w32(seq); w32(0L)
    bos.write(laces.length); laces.foreach(bos.write)
    (0 until laces.sum).foreach(_ => bos.write(0))
    bos.toByteArray
  }

  test("synth stream round-trips: offsets, lacing sums, packet ends, flags, fields") {
    val seed = 5L
    val pages = Ogg.parsePages(seed, Ogg.synthOgg(seed))
    val n = Ogg.pageCount(seed)
    assert(pages.length == n)
    pages.zipWithIndex.foreach { case (p, i) =>
      val sizes = (0 until Ogg.packetCount(seed, i)).map(j => Ogg.packetSize(seed, i, j))
      assert(p.page_idx == i && p.seq == i)
      assert(p.body_len == sizes.sum, s"body of page $i")
      assert(p.n_segs == sizes.map(_ / 255 + 1).sum, s"segs of page $i")
      assert(p.pkt_ends == sizes.length, s"packet ends of page $i")
      assert(p.hdr_len == 27 + p.n_segs)
      assert(p.granule == Ogg.granuleOf(seed, i))
      assert(p.serial == Ogg.serialOf(seed))
      assert(p.bos == (i == 0) && p.eos == (i == n - 1) && !p.continued)
    }
    // offsets chain exactly
    pages.sliding(2).foreach { case Seq(a, b) =>
      assert(b.offset == a.offset + a.hdr_len + a.body_len)
    }
    (0L to 20L).foreach { s =>
      assert(Ogg.parsePages(s, Ogg.synthOgg(s)).length == Ogg.pageCount(s))
    }
  }

  test("multi-segment lacing: 255-spans and the exact-multiple 0 terminator") {
    // a 510-byte packet laces as [255, 255, 0]; a 300-byte one as [255, 45]
    val pg = pageBytes(0x2, 7L, 42L, 0L, Seq(255, 255, 0, 255, 45))
    val got = Ogg.parsePages(1L, pg)
    assert(got.length == 1)
    val p = got.head
    assert(p.body_len == 810 && p.n_segs == 5 && p.pkt_ends == 2)
  }

  test("cross-page packet continuation: trailing 255 + continued flag") {
    // packet of 300 bytes split: page 0 carries 255 (no end), page 1
    // carries the 45-byte tail (continued flag set) plus a 10-byte packet
    val s = pageBytes(0x2, -1L, 9L, 0L, Seq(255)) ++
            pageBytes(0x1, 16L, 9L, 1L, Seq(45, 10))
    val got = Ogg.parsePages(2L, s)
    assert(got.length == 2)
    assert(got(0).pkt_ends == 0 && !got(0).continued)   // no packet completes
    assert(got(1).pkt_ends == 2 && got(1).continued)
    assert(got(0).granule == -1L)                        // the RFC's "no packet ends" marker
    assert(got(1).offset == 27 + 1 + 255)
  }

  test("little-endian field extremes round-trip") {
    val p = pageBytes(0x4, Long.MaxValue, 0xffffffffL, 0xfffffffeL, Seq(0))
    val got = Ogg.parsePages(3L, p)
    assert(got.length == 1)
    assert(got.head.granule == Long.MaxValue)
    assert(got.head.serial == 0xffffffffL && got.head.seq == 0xfffffffeL)
    assert(got.head.eos && got.head.body_len == 0 && got.head.pkt_ends == 1)
  }

  test("malformed input degrades to a partial index, never throws") {
    val good = Ogg.synthOgg(7L)
    assert(Ogg.parsePages(7L, Array.emptyByteArray).isEmpty)
    assert(Ogg.parsePages(7L, "definitely not a container".getBytes).isEmpty)
    val pages = Ogg.parsePages(7L, good)
    // truncate mid-page: earlier pages survive, the cut one is dropped
    val cutAt = (pages(3).offset + 30).toInt
    val partial = Ogg.parsePages(7L, good.take(cutAt))
    assert(partial.length == 3 && partial == pages.take(3))
    // corrupt a mid-stream capture pattern: strict stop there
    val broken = good.clone()
    broken(pages(4).offset.toInt) = 'X'
    assert(Ogg.parsePages(7L, broken).length == 4)
    // nonzero version byte is not ours to parse
    val vbad = good.clone()
    vbad(4) = 1
    assert(Ogg.parsePages(7L, vbad).isEmpty)
    // segment table longer than the buffer: dropped, no throw
    val hdrOnly = pageBytes(0, 0L, 1L, 0L, Seq.fill(200)(255)).take(40)
    assert(Ogg.parsePages(7L, hdrOnly).isEmpty)
  }

  test("fuzz: random bytes, corruptions and truncations never throw") {
    val rnd = new scala.util.Random(0x066)
    (1 to 300).foreach { _ =>
      val bs = new Array[Byte](rnd.nextInt(500))
      rnd.nextBytes(bs)
      Ogg.parsePages(1L, bs) // must not throw
    }
    val good = Ogg.synthOgg(9L)
    (1 to 500).foreach { _ =>
      val b = good.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      // length-led walk: the index can shrink or re-segment, never exceed
      // the byte budget over the minimum page size
      assert(Ogg.parsePages(9L, b).length <= good.length / 27)
    }
    (1 to 200).foreach { _ =>
      Ogg.parsePages(9L, good.take(rnd.nextInt(good.length)))
    }
  }
}
