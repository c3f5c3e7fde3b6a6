package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level unit coverage for the MP4 sample-table parser — the shapes
  * the oracle-gated q202 can't reach: uniform-size stsz, co64 offsets,
  * largesize boxes, unknown-box skipping, and malformed-input degradation
  * (a corrupt blob must yield empty, never throw — partition-local decode
  * over a 100 TB corpus cannot die on one file). */
class Mp4Spec extends AnyFunSuite {

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ typ.getBytes ++ body
  }
  private def chain(stblChildren: Array[Byte]*): Array[Byte] =
    box("moov", box("trak", box("mdia", box("minf", box("stbl", stblChildren: _*)))))

  test("synth container round-trips: sizes, offsets, chunks, durations") {
    val seed = 7L
    val samples = Mp4.parseSampleTable(seed, Mp4.synthMp4(seed))
    val n = Mp4.sampleCount(seed)
    assert(samples.length == n)
    assert(samples.map(_.size) == (0 until n).map(Mp4.sampleSize(seed, _)))
    assert(samples.map(_.duration) == (0 until n).map(Mp4.sampleDuration))
    // offsets are data_start (32) + prefix sums; contiguous across chunks
    val expectedOffs = (0 until n).map(i =>
      32L + (0 until i).map(Mp4.sampleSize(seed, _).toLong).sum)
    assert(samples.map(_.offset) == expectedOffs)
    assert(samples.map(_.chunk_idx) == (0 until n).map(_ / 4))
    // every seed in the q202 range parses completely
    (0L to 20L).foreach { s =>
      assert(Mp4.parseSampleTable(s, Mp4.synthMp4(s)).length == Mp4.sampleCount(s))
    }
  }

  test("uniform-size stsz and co64 offsets parse") {
    val stts = box("stts", be32(0), be32(1), be32(3), be32(500))
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(3), be32(1))
    val stszUniform = box("stsz", be32(0), be32(64), be32(3))
    val co64 = box("co64", be32(0), be32(1), be64(1L << 33)) // past u32 range
    val payload = chain(stts, stsc, stszUniform, co64)
    val got = Mp4.parseSampleTable(1L, payload)
    assert(got.map(_.size) == Seq(64, 64, 64))
    assert(got.map(_.offset) == Seq(1L << 33, (1L << 33) + 64, (1L << 33) + 128))
    assert(got.map(_.duration) == Seq(500, 500, 500))
  }

  test("moov-only ranged read: uniform stsz with more samples than local bytes parses") {
    // the 100 TB access mode fetches ONLY the moov box; with uniform_size
    // the table stores no per-sample entries, so a long video's sample
    // count legitimately dwarfs the locally-present bytes — the
    // payload-length bound applies only to the non-uniform table
    val n = 10000
    val stts = box("stts", be32(0), be32(1), be32(n.toLong), be32(512))
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(n.toLong), be32(1))
    val stszUniform = box("stsz", be32(0), be32(64), be32(n.toLong))
    val stco = box("stco", be32(0), be32(1), be32(1L << 20)) // mdat far past this buffer
    val moovOnly = chain(stts, stsc, stszUniform, stco)
    assert(moovOnly.length < n) // the premise: fewer local bytes than samples
    val got = Mp4.parseSampleTable(1L, moovOnly)
    assert(got.length == n)
    assert(got.head.offset == (1L << 20) && got.head.size == 64)
    assert(got.last.offset == (1L << 20) + 64L * (n - 1))
  }

  test("largesize (size==1) boxes and unknown siblings are handled") {
    val stts = box("stts", be32(0), be32(1), be32(1), be32(100))
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(1), be32(1))
    val stsz = box("stsz", be32(0), be32(0), be32(1), be32(10))
    val stco = box("stco", be32(0), be32(1), be32(40))
    val junk = box("free", new Array[Byte](9))
    val stbl = box("stbl", junk, stsz, junk, stts, stsc, stco)
    // wrap moov as a LARGESIZE box: size field 1 + 64-bit size after type
    val inner = box("trak", box("mdia", box("minf", stbl)))
    val moov = be32(1) ++ "moov".getBytes ++ be64(16L + inner.length) ++ inner
    val got = Mp4.parseSampleTable(2L, moov)
    assert(got == Seq(Mp4.Mp4Sample(2L, 0, 0, 10, 40L, 100)))
  }

  test("malformed input degrades to empty, never throws") {
    val good = Mp4.synthMp4(3L)
    assert(Mp4.parseSampleTable(3L, Array.emptyByteArray).isEmpty)
    assert(Mp4.parseSampleTable(3L, good.take(40)).isEmpty)        // truncated
    assert(Mp4.parseSampleTable(3L, Array.fill(64)(0x7f.toByte)).isEmpty)
    // flip a size field deep inside moov: walk must bail, not overrun
    val broken = good.clone()
    val moovOff = good.length - 1
    broken(moovOff) = 0x7f
    assert(Mp4.parseSampleTable(3L, broken).length <= Mp4.sampleCount(3L))
    // stts/stsz disagreement (duration count != sample count) is rejected
    val stts = box("stts", be32(0), be32(1), be32(2), be32(100)) // 2 durations
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(1), be32(1))
    val stsz = box("stsz", be32(0), be32(0), be32(1), be32(10))  // 1 sample
    val stco = box("stco", be32(0), be32(1), be32(40))
    assert(Mp4.parseSampleTable(4L, chain(stts, stsc, stsz, stco)).isEmpty)
  }

  test("fuzz: random bytes and random corruptions never throw") {
    // deterministic fuzz (fixed seed — Date/random-free per repo policy
    // for RESULTS; a seeded RNG in a test is reproducible): the parser's
    // degrade contract must hold for arbitrary garbage AND for valid
    // containers with point corruptions, where naive offset math would
    // index out of bounds
    val rnd = new scala.util.Random(0x5eed)
    (1 to 300).foreach { _ =>
      val bs = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(bs)
      Mp4.parseSampleTable(1L, bs) // must not throw
    }
    val good = Mp4.synthMp4(9L)
    (1 to 500).foreach { _ =>
      val b = good.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      val r = Mp4.parseSampleTable(9L, b) // must not throw
      assert(r.length <= Mp4.sampleCount(9L))
    }
    (1 to 200).foreach { _ =>
      val cut = rnd.nextInt(good.length)
      Mp4.parseSampleTable(9L, good.take(cut)) // truncations
    }
  }

  test("hostile counts and degenerate stsc degrade to empty, never throw or OOM") {
    val stts1 = box("stts", be32(0), be32(1), be32(1), be32(100))
    val stsc1 = box("stsc", be32(0), be32(1), be32(1), be32(1), be32(1))
    val stco1 = box("stco", be32(0), be32(1), be32(40))
    // uniform stsz with a 2^31-scale count: must NOT allocate 2G elements
    val stszHuge = box("stsz", be32(0), be32(64), be32(0x7fffffffL))
    assert(Mp4.parseSampleTable(1L, chain(stts1, stsc1, stszHuge, stco1)).isEmpty)
    // stts run with a hostile sample_count far past the sample table
    val sttsHuge = box("stts", be32(0), be32(1), be32(0x7fffffffL), be32(100))
    val stsz1 = box("stsz", be32(0), be32(0), be32(1), be32(10))
    assert(Mp4.parseSampleTable(2L, chain(sttsHuge, stsc1, stsz1, stco1)).isEmpty)
    // stsc with ZERO entries (chunks exist, no mapping) must not throw
    val stscEmpty = box("stsc", be32(0), be32(0))
    assert(Mp4.parseSampleTable(3L, chain(stts1, stscEmpty, stsz1, stco1)).isEmpty)
    // stsc whose entries mix negative counts to a "consistent" sum must
    // not overrun the size table: (1,10),(2,-9) sums to 1 over 2 chunks
    val stco2 = box("stco", be32(0), be32(2), be32(40), be32(80))
    val stscNeg = box("stsc", be32(0), be32(2),
      be32(1), be32(10), be32(1), be32(2), be32(0xfffffff7L), be32(1))
    assert(Mp4.parseSampleTable(4L, chain(stts1, stscNeg, stsz1, stco2)).isEmpty)
  }
}
