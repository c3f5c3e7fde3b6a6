package graft.ext

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure (Spark-free) kernels — randomized inputs
  * catch the boundary shapes fixtures miss (tiny series, heavy ties,
  * degenerate buckets, extreme samples). Uses scalacheck generators with
  * fixed seeds (no scalatestplus bridge in the offline cache), so every
  * run replays the same 200 cases — failures are reproducible by seed. */
class KernelPropertySpec extends AnyFunSuite {

  private val params = Gen.Parameters.default
  private def sample[A](g: Gen[A], seed: Long): A = g.pureApply(params, Seed(seed))

  // ---------------------------------------------------------------- LTTB invariants
  private val seriesGen: Gen[Vector[(Long, Long)]] = for {
    n <- Gen.choose(0, 120)
    xs <- Gen.listOfN(n, Gen.choose(-1000L, 1000L)).map(_.distinct.sorted)
    ys <- Gen.listOfN(xs.length, Gen.choose(-50L, 50L))
  } yield xs.zip(ys).toVector

  test("lttb: structural invariants hold on 200 random series") {
    for (s <- 0 until 200) {
      val ps = sample(seriesGen, s.toLong)
      val k = 3 + (s % 18)
      val out = SeriesStats.lttb(ps, k)
      if (ps.length <= k) assert(out == ps, s"seed=$s")     // identity under k
      else {
        assert(out.length == k, s"seed=$s")
        assert(out.head == ps.head && out.last == ps.last, s"seed=$s") // endpoints
        assert(out == out.sortBy(_._1), s"seed=$s")          // order preserved
        val in = ps.toSet
        assert(out.forall(in.contains), s"seed=$s")          // subsequence of input
        assert(out.distinct.length == out.length, s"seed=$s")
        // one selection per middle bucket: selected middle points hit
        // strictly increasing buckets 0..k-3
        val mid = ps.slice(1, ps.length - 1)
        val idxOf = mid.zipWithIndex.toMap
        val buckets = out.slice(1, k - 1).map(p => idxOf(p).toLong * (k - 2) / mid.length)
        assert(buckets == (0L until (k - 2).toLong), s"seed=$s")
      }
      assert(SeriesStats.lttb(ps, k) == out, s"seed=$s: nondeterministic")
    }
  }

  // ---------------------------------------------------------------- WAV codec roundtrip
  test("WAV synth→decode roundtrip recovers exact closed-form statistics (100 cases)") {
    val seedGen = Gen.choose(Long.MinValue / 200, Long.MaxValue / 200)
    val lenGen = Gen.choose(1, 256)
    for (s <- 0 until 100) {
      val wavSeed = sample(seedGen, s.toLong)
      val n = sample(lenGen, (s + 1000).toLong)
      val feats = Multimodal.decodeAudio(Iterator(
        Multimodal.MediaRow(1L, "audio/wav", Multimodal.synthWav(wavSeed, n)))).next()
      val sm = (0 until n).map(i =>
        Math.floorMod(wavSeed * 131 + i.toLong * 7919, 65536L).toInt - 32768)
      assert(feats.decoded && feats.n_samples == n, s"case=$s")
      assert(feats.s_sum == sm.map(_.toLong).sum, s"case=$s")
      assert(feats.s_min == sm.min && feats.s_max == sm.max, s"case=$s")
      assert(feats.s_posw == sm.zipWithIndex.map { case (v, i) => v.toLong * i }.sum,
        s"case=$s")
      assert(feats.sq_sum == sm.map(v => v.toLong * v).sum, s"case=$s")
    }
  }

  // ---------------------------------------------------------------- CDC chunk kernel invariants
  test("cdcChunks: lossless decomposition with local boundaries on 200 random strings") {
    import org.apache.spark.unsafe.types.UTF8String
    def chunksOf(t: String): Seq[String] = {
      val arr = graft.functions.ExprKernels.cdcChunks(UTF8String.fromString(t))
      (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    }
    val strGen = for {
      n <- Gen.choose(0, 400)
      cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'f') ++ Seq(' ')))
    } yield cs.mkString
    for (s <- 0 until 200) {
      val t = sample(strGen, s.toLong)
      val ch = chunksOf(t)
      // lossless: chunks concatenate back to the input
      assert(ch.mkString == t, s"seed=$s")
      // empty text is the ONE case with an empty chunk (the [0] edge)
      if (t.isEmpty) assert(ch == Seq(""), s"seed=$s")
      else assert(ch.forall(_.nonEmpty), s"seed=$s")
      // every chunk end (except the final forced one) is a hash boundary,
      // and no interior position of any chunk is one — the content-defined
      // property that makes boundaries re-synchronize after edits
      def isBoundary(pos: Int): Boolean = pos >= 4 &&
        ((t.charAt(pos - 4).toLong * 29791 + t.charAt(pos - 3).toLong * 961 +
          t.charAt(pos - 2).toLong * 31 + t.charAt(pos - 1).toLong) % 16) == 0
      var off = 0
      for ((c, idx) <- ch.zipWithIndex) {
        for (p <- off + 1 until off + c.length)
          assert(!isBoundary(p), s"seed=$s: interior boundary at $p")
        off += c.length
        if (idx < ch.length - 1) assert(isBoundary(off), s"seed=$s: chunk end $off not a boundary")
      }
    }
  }
}
