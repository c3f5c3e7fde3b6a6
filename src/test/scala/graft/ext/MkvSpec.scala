package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level coverage for the EBML/Matroska block parser: round-trip
  * against the synthesizer, negative relative timestamps, multi-byte
  * track VINTs, and malformed-input degradation (empty, never a throw). */
class MkvSpec extends AnyFunSuite {

  test("synth container round-trips: sizes, offsets, clusters, timestamps") {
    val seed = 11L
    val blocks = Mkv.parseBlocks(seed, Mkv.synthMkv(seed))
    val nC = Mkv.clusterCount(seed)
    assert(blocks.length == nC * Mkv.BlocksPerCluster)
    assert(blocks.map(_.track).distinct == Seq(1))
    blocks.zipWithIndex.foreach { case (blk, i) =>
      val (c, b) = (i / 5, i % 5)
      assert(blk.block_idx == i && blk.cluster_idx == c)
      assert(blk.size == Mkv.blockSize(seed, c, b))
      assert(blk.ts_ms == c * 1000 + b * 40)
      val expOff = 68L + 10 * c + 7 * i +
        (0 until i).map(j => Mkv.blockSize(seed, j / 5, j % 5).toLong).sum
      assert(blk.offset == expOff, s"offset of block $i")
    }
    (0L to 20L).foreach { s =>
      assert(Mkv.parseBlocks(s, Mkv.synthMkv(s)).length ==
        Mkv.clusterCount(s) * Mkv.BlocksPerCluster)
    }
  }

  test("negative relative timestamps resolve against the cluster base") {
    // hand-build one cluster at ts 5000 with a block at rel −200
    def be(v: Long, n: Int) =
      (n - 1 to 0 by -1).map(k => ((v >> (8 * k)) & 0xff).toByte).toArray
    val tsEl = Array(0xE7.toByte, 0x82.toByte) ++ be(5000L, 2)
    val blockBody = Array(0x81.toByte) ++ be(0xFF38L, 2) ++ Array(0x80.toByte) ++
      new Array[Byte](4) // rel = 0xFF38 as int16 = −200
    val block = Array(0xA3.toByte, 0x88.toByte) ++ blockBody
    val content = tsEl ++ block
    val cluster = be(0x1F43B675L, 4) ++ Array((0x80 | content.length).toByte) ++ content
    val segment = be(0x18538067L, 4) ++ Array((0x80 | cluster.length).toByte) ++ cluster
    val got = Mkv.parseBlocks(9L, segment)
    assert(got.map(b => (b.ts_ms, b.size)) == Seq((4800, 4)))
  }

  private def be(v: Long, n: Int) =
    (n - 1 to 0 by -1).map(k => ((v >> (8 * k)) & 0xff).toByte).toArray
  private def cluster1(content: Array[Byte]) =
    be(0x1F43B675L, 4) ++ Array((0x80 | content.length).toByte) ++ content
  private def segment1(content: Array[Byte]) =
    be(0x18538067L, 4) ++ Array((0x80 | content.length).toByte) ++ content

  test("unknown-size Segment and Cluster (streamed WebM) still index; cluster ends at next sibling") {
    val tsA = Array(0xE7.toByte, 0x81.toByte, 0x01.toByte)          // ts 1
    val tsB = Array(0xE7.toByte, 0x81.toByte, 0x02.toByte)          // ts 2
    def blk(sz: Int) = Array(0xA3.toByte, (0x80 | (4 + sz)).toByte,
      0x81.toByte) ++ be(0L, 2) ++ Array(0x00.toByte) ++ new Array[Byte](sz)
    // cluster A: UNKNOWN size (0xFF 1-byte vint), ends where cluster B begins
    val clusterA = be(0x1F43B675L, 4) ++ Array(0xFF.toByte) ++ tsA ++ blk(3)
    val clusterB = cluster1(tsB ++ blk(5))
    // segment: UNKNOWN size (8-byte all-ones vint)
    val segBody = clusterA ++ clusterB
    val seg = be(0x18538067L, 4) ++
      (Array(0x01.toByte) ++ Array.fill(7)(0xFF.toByte)) ++ segBody
    val got = Mkv.parseBlocks(1L, seg)
    assert(got.map(b => (b.cluster_idx, b.ts_ms, b.size)) == Seq((0, 1, 3), (1, 2, 5)))
  }

  test("laced SimpleBlocks expand to exact per-frame sizes and offsets") {
    def vint2(v: Int) = Array((0x40 | (v >> 8)).toByte, (v & 0xff).toByte)
    // Xiph lacing: 3 frames of sizes 2, 300, 4 (300 = 255 + 45 run)
    val xiphBody = Array(0x81.toByte) ++ be(0L, 2) ++ Array(0x02.toByte) ++ // flags: Xiph
      Array(0x02.toByte) ++                                   // laceN = 2 → 3 frames
      Array(0x02.toByte, 0xFF.toByte, 0x2D.toByte) ++         // sizes 2, 255+45
      new Array[Byte](2 + 300 + 4)
    val xiph = Array(0xA3.toByte) ++ vint2(xiphBody.length) ++ xiphBody
    // fixed lacing: 4 equal frames of 6 bytes
    val fixedBody = Array(0x81.toByte) ++ be(0L, 2) ++ Array(0x04.toByte) ++ // flags: fixed
      Array(0x03.toByte) ++ new Array[Byte](24)
    val fixed = Array(0xA3.toByte) ++ vint2(fixedBody.length) ++ fixedBody
    // EBML lacing: frames 10, 7, 9 (first vint 10, signed delta −3, last implicit)
    val ebmlBody = Array(0x81.toByte) ++ be(0L, 2) ++ Array(0x06.toByte) ++ // flags: EBML
      Array(0x02.toByte) ++                                   // laceN = 2 → 3 frames
      Array(0x8A.toByte) ++                                   // first = 10 (1-byte vint)
      Array(0xBC.toByte) ++                                   // vint 60 → 60 − 63 = −3 → 7
      new Array[Byte](10 + 7 + 9)
    val ebml = Array(0xA3.toByte) ++ vint2(ebmlBody.length) ++ ebmlBody
    val ts = Array(0xE7.toByte, 0x81.toByte, 0x00.toByte)
    val content = ts ++ xiph ++ fixed ++ ebml
    val clu = be(0x1F43B675L, 4) ++ vint2(content.length) ++ content
    val seg = be(0x18538067L, 4) ++ vint2(clu.length) ++ clu
    val got = Mkv.parseBlocks(2L, seg)
    assert(got.map(_.size) == Seq(2, 300, 4, 6, 6, 6, 6, 10, 7, 9))
    // frames within a lace sit back-to-back at exact offsets
    def offs(from: Int, n: Int) = got.slice(from, from + n)
    for (g <- Seq(offs(0, 3), offs(3, 4), offs(7, 3)); Seq(a, b) <- g.sliding(2))
      assert(b.offset == a.offset + a.size, s"frames not contiguous: $a -> $b")
    // block indices are global and dense
    assert(got.map(_.block_idx) == (0 until 10))
  }

  test("fuzz: random bytes and random corruptions never throw") {
    val rnd = new scala.util.Random(0xEB31)
    (1 to 300).foreach { _ =>
      val bs = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(bs)
      Mkv.parseBlocks(1L, bs) // must not throw
    }
    val good = Mkv.synthMkv(9L)
    val maxBlocks = Mkv.clusterCount(9L) * Mkv.BlocksPerCluster
    (1 to 500).foreach { _ =>
      val b = good.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      // corruption can flip a size VINT to "unknown" or re-lace a block,
      // so only the no-throw property and a sanity bound are asserted
      val r = Mkv.parseBlocks(9L, b)
      assert(r.length <= maxBlocks + 300, "corruption exploded the index")
    }
    (1 to 200).foreach { _ =>
      val cut = rnd.nextInt(good.length)
      Mkv.parseBlocks(9L, good.take(cut)) // truncations
    }
  }

  test("malformed input degrades to empty, never throws") {
    val good = Mkv.synthMkv(5L)
    assert(Mkv.parseBlocks(5L, Array.emptyByteArray).isEmpty)
    assert(Mkv.parseBlocks(5L, good.take(30)).isEmpty)          // truncated
    assert(Mkv.parseBlocks(5L, Array.fill(64)(0x00.toByte)).isEmpty) // invalid VINT
    val broken = good.clone()
    broken(60) = 0xFF.toByte // corrupt inside the first cluster
    val partial = Mkv.parseBlocks(5L, broken)
    assert(partial.length <= Mkv.clusterCount(5L) * Mkv.BlocksPerCluster)
    // a ZERO-size SimpleBlock ending exactly at the buffer end must
    // degrade, not read past the array for its track byte
    def be(v: Long, n: Int) =
      (n - 1 to 0 by -1).map(k => ((v >> (8 * k)) & 0xff).toByte).toArray
    val emptyBlock = Array(0xA3.toByte, 0x80.toByte) // size 0, nothing after
    val cluster = be(0x1F43B675L, 4) ++
      Array((0x80 | emptyBlock.length).toByte) ++ emptyBlock
    val segment = be(0x18538067L, 4) ++
      Array((0x80 | cluster.length).toByte) ++ cluster
    assert(Mkv.parseBlocks(6L, segment).isEmpty)
  }

  test("single-frame laced blocks (lace count 1) carry ZERO size entries in every mode") {
    // the spec stores count-1 sizes: with one frame, NO size bytes follow
    // the lace-count byte — an EBML-mode reader that still consumed a
    // first-size VINT would mis-size this legal block
    def one(flags: Int, sz: Int) = {
      val body = Array(0x81.toByte) ++ be(0L, 2) ++
        Array(flags.toByte, 0x00.toByte) ++ new Array[Byte](sz)
      Array(0xA3.toByte, (0x80 | body.length).toByte) ++ body
    }
    for (flags <- Seq(0x02, 0x04, 0x06)) { // Xiph, fixed, EBML
      val content = Array(0xE7.toByte, 0x81.toByte, 0x00.toByte) ++ one(flags, 9)
      val got = Mkv.parseBlocks(3L, segment1(cluster1(content)))
      assert(got.map(_.size) == Seq(9), s"lacing mode flags=$flags")
    }
  }

  test("BlockGroup synth round-trips: sizes, offsets, durations, timestamps") {
    val seed = 11L
    val blocks = Mkv.parseBlocks(seed, Mkv.synthMkvGrouped(seed))
    val nC = Mkv.clusterCount(seed)
    assert(blocks.length == nC * Mkv.BlocksPerCluster)
    blocks.zipWithIndex.foreach { case (blk, i) =>
      val (c, b) = (i / 5, i % 5)
      assert(blk.block_idx == i && blk.cluster_idx == c)
      assert(blk.size == Mkv.blockSize(seed, c, b))
      assert(blk.ts_ms == c * 1000 + b * 40)
      assert(blk.dur_ms == Mkv.blockDur(seed, c, b), s"duration of block $i")
      val expOff = 71L + 10 * c + 13 * i +
        (0 until i).map(j => Mkv.blockSize(seed, j / 5, j % 5).toLong).sum
      assert(blk.offset == expOff, s"offset of block $i")
    }
    (0L to 20L).foreach { s =>
      val r = Mkv.parseBlocks(s, Mkv.synthMkvGrouped(s))
      assert(r.length == Mkv.clusterCount(s) * Mkv.BlocksPerCluster)
      assert(r.forall(_.dur_ms >= 30))
    }
  }

  test("BlockGroup × lacing matrix: wrapped laced Blocks expand with durations attached") {
    def vint2(v: Int) = Array((0x40 | (v >> 8)).toByte, (v & 0xff).toByte)
    def group(blockBody: Array[Byte], dur: Int, durFirst: Boolean) = {
      val blockEl = Array(0xA1.toByte) ++ vint2(blockBody.length) ++ blockBody
      val durEl = Array(0x9B.toByte, 0x81.toByte, dur.toByte)
      val body = if (durFirst) durEl ++ blockEl else blockEl ++ durEl
      Array(0xA0.toByte) ++ vint2(body.length) ++ body
    }
    // Xiph lacing: 3 frames 2, 300, 4; duration AFTER the Block
    val xiphBody = Array(0x81.toByte) ++ be(0L, 2) ++ Array(0x02.toByte) ++
      Array(0x02.toByte) ++
      Array(0x02.toByte, 0xFF.toByte, 0x2D.toByte) ++
      new Array[Byte](2 + 300 + 4)
    // fixed lacing: 4 frames of 6; duration BEFORE the Block (legal order)
    val fixedBody = Array(0x81.toByte) ++ be(0L, 2) ++ Array(0x04.toByte) ++
      Array(0x03.toByte) ++ new Array[Byte](24)
    // EBML lacing: frames 10, 7, 9
    val ebmlBody = Array(0x81.toByte) ++ be(0L, 2) ++ Array(0x06.toByte) ++
      Array(0x02.toByte) ++ Array(0x8A.toByte) ++ Array(0xBC.toByte) ++
      new Array[Byte](10 + 7 + 9)
    // unlaced Block with NO duration child at all
    val plainBody = Array(0x81.toByte) ++ be(0L, 2) ++ Array(0x00.toByte) ++
      new Array[Byte](5)
    val ts = Array(0xE7.toByte, 0x81.toByte, 0x00.toByte)
    // the last group carries NO duration element at all
    val plainEl = Array(0xA1.toByte) ++ vint2(plainBody.length) ++ plainBody
    val plainGroup = Array(0xA0.toByte) ++ vint2(plainEl.length) ++ plainEl
    val content2 = ts ++ group(xiphBody, 33, durFirst = false) ++
      group(fixedBody, 44, durFirst = true) ++
      group(ebmlBody, 55, durFirst = false) ++ plainGroup
    def vint2seg(c: Array[Byte]) = {
      val clu = be(0x1F43B675L, 4) ++ vint2(c.length) ++ c
      be(0x18538067L, 4) ++ vint2(clu.length) ++ clu
    }
    val got = Mkv.parseBlocks(4L, vint2seg(content2))
    assert(got.map(_.size) == Seq(2, 300, 4, 6, 6, 6, 6, 10, 7, 9, 5))
    assert(got.map(_.dur_ms) == Seq(33, 33, 33, 44, 44, 44, 44, 55, 55, 55, -1))
    // frames within each laced group sit back-to-back
    def offs(from: Int, n: Int) = got.slice(from, from + n)
    for (g <- Seq(offs(0, 3), offs(3, 4), offs(7, 3)); Seq(a, b) <- g.sliding(2))
      assert(b.offset == a.offset + a.size, s"frames not contiguous: $a -> $b")
    assert(got.map(_.block_idx) == (0 until 11))
    // SimpleBlocks and BlockGroups interleave in one cluster
    val sb = Array(0xA3.toByte) ++ vint2(plainBody.length) ++ plainBody
    val mixed = ts ++ sb ++ group(plainBody, 66, durFirst = false) ++ sb
    val gotMixed = Mkv.parseBlocks(5L, vint2seg(mixed))
    assert(gotMixed.map(_.dur_ms) == Seq(-1, 66, -1))
    assert(gotMixed.map(_.size) == Seq(5, 5, 5))
  }

  test("a corrupt BlockGroup loses only itself; grouped fuzz never throws") {
    val good = Mkv.synthMkvGrouped(9L)
    val total = Mkv.clusterCount(9L) * Mkv.BlocksPerCluster
    // zero out the first group's Block id: the group walk finds no Block
    // and emits nothing, but later groups still index
    val blocks = Mkv.parseBlocks(9L, good)
    val firstBlockElOff = (blocks.head.offset - 7).toInt // group hdr consumed; block el id at off-7
    val broken = good.clone()
    broken(firstBlockElOff) = 0x6F.toByte // a valid-width but unknown id
    val partial = Mkv.parseBlocks(9L, broken)
    assert(partial.length == total - 1, "only the corrupted group should drop")
    assert(partial.head.block_idx == 0 && partial.head.dur_ms >= 30)
    // fuzz the grouped form like the SimpleBlock form
    val rnd = new scala.util.Random(0xB10C)
    (1 to 300).foreach { _ =>
      val b = good.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      val r = Mkv.parseBlocks(9L, b)
      assert(r.length <= total + 300, "corruption exploded the index")
    }
    (1 to 200).foreach { _ =>
      Mkv.parseBlocks(9L, good.take(rnd.nextInt(good.length)))
    }
  }
}
