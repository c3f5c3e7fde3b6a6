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
}
