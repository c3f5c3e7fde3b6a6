package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level unit coverage for the ADTS frame walker — round-trip
  * against the synthesizer (both header forms), hand-built header field
  * extremes, and malformed-input degradation (partial index, never a
  * throw — same contract as the MP4/MKV walks). */
class AdtsSpec extends AnyFunSuite {

  test("synth stream round-trips: lengths, offsets, header forms, fullness") {
    val seed = 5L
    val frames = Adts.parseFrames(seed, Adts.synthAdts(seed))
    val n = Adts.frameCount(seed)
    assert(frames.length == n)
    frames.zipWithIndex.foreach { case (f, i) =>
      assert(f.frame_idx == i)
      assert(f.hdr_len == Adts.headerLen(i), s"header form of frame $i")
      assert(f.frame_len == Adts.headerLen(i) + Adts.payloadSize(seed, i))
      assert(f.fullness == Adts.frameFullness(seed, i), s"fullness of frame $i")
      assert(f.sfreq_idx == 4 && f.channels == 2 && f.rdb == 1)
      val expOff = (0 until i).map(j =>
        (Adts.headerLen(j) + Adts.payloadSize(seed, j)).toLong).sum
      assert(f.offset == expOff, s"offset of frame $i")
    }
    (0L to 20L).foreach { s =>
      assert(Adts.parseFrames(s, Adts.synthAdts(s)).length == Adts.frameCount(s))
    }
  }

  test("13-bit length and 11-bit fullness fields assemble across byte boundaries") {
    // hand-build one maximal-field frame: len 0x1FFF won't fit a buffer,
    // so use len 300 (spans all three length sub-fields: 100101100 binary)
    // and fullness 0x7FF (all ones across the 5+6 split)
    val len = 300
    val full = 0x7ff
    val hdr = Array[Int](
      0xff, 0xf1,
      (0x1 << 6) | (11 << 2) | 0x0,         // sfreq idx 11
      (0x1 << 6) | ((len >> 11) & 0x3),     // 1 channel
      (len >> 3) & 0xff,
      ((len & 0x7) << 5) | ((full >> 6) & 0x1f),
      ((full & 0x3f) << 2) | 0x2            // rdb-1 = 2
    ).map(_.toByte)
    val payload = hdr ++ new Array[Byte](len - 7)
    val got = Adts.parseFrames(1L, payload)
    assert(got.length == 1)
    val f = got.head
    assert(f.frame_len == len && f.hdr_len == 7)
    assert(f.fullness == full && f.sfreq_idx == 11 && f.channels == 1 && f.rdb == 3)
  }

  test("malformed input degrades to a partial index, never throws") {
    val good = Adts.synthAdts(7L)
    assert(Adts.parseFrames(7L, Array.emptyByteArray).isEmpty)
    assert(Adts.parseFrames(7L, "not audio at all".getBytes).isEmpty)
    // truncate mid-frame: frames before the cut survive, the cut one is dropped
    val frames = Adts.parseFrames(7L, good)
    val cutAt = (frames(3).offset + 2).toInt
    val partial = Adts.parseFrames(7L, good.take(cutAt))
    assert(partial.length == 3)
    assert(partial == frames.take(3))
    // corrupt a mid-stream syncword: strict walk stops there
    val broken = good.clone()
    broken(frames(5).offset.toInt) = 0x00
    assert(Adts.parseFrames(7L, broken).length == 5)
    // a frame_length below the header size is structurally invalid
    val tiny = Array[Int](0xff, 0xf1, 0x50, 0x80, 0x00, 0x60, 0x00).map(_.toByte) ++
      new Array[Byte](16) // len field = 3 < 7
    assert(Adts.parseFrames(7L, tiny).isEmpty)
  }

  test("fuzz: random bytes and random corruptions never throw") {
    val rnd = new scala.util.Random(0xADF5)
    (1 to 300).foreach { _ =>
      val bs = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(bs)
      Adts.parseFrames(1L, bs) // must not throw
    }
    val good = Adts.synthAdts(9L)
    val maxFrames = Adts.frameCount(9L)
    (1 to 500).foreach { _ =>
      val b = good.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      // corruption can only shrink or re-segment; the walk is length-led,
      // so the index stays bounded by the byte budget
      val r = Adts.parseFrames(9L, b)
      assert(r.length <= good.length / 7, "corruption exploded the index")
      assert(r.length <= maxFrames + good.length / 7)
    }
    (1 to 200).foreach { _ =>
      val cut = rnd.nextInt(good.length)
      Adts.parseFrames(9L, good.take(cut)) // truncations
    }
  }
}
