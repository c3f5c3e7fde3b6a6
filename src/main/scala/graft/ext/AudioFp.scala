package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Audio near-dup via an energy-contour fingerprint — the audio twin of
  * [[ImageDhash]]: decode PCM, frame it, take one bit per consecutive
  * frame-ENERGY comparison. Like dHash's brightness invariance, the
  * contour is AMPLITUDE-invariant by construction (a uniform gain scales
  * every frame energy by the same k², leaving all comparisons intact) —
  * which the gate data exploits: clips are planted in pairs (even id =
  * base signal, odd id = the same signal at 2× gain) that MUST share a
  * fingerprint and cluster. FFT-free on purpose: energies are exact
  * integer sums of squares, so the fingerprint is bit-reproducible
  * across engines — a spectral fingerprint would drag float FFT
  * ordering into the gate.
  *
  * The Spark side is the REAL pipeline: 16-bit PCM synth → RIFF/WAVE
  * encode → JDK `AudioSystem` decode → signed little-endian sample
  * reassembly → 32×64 frame energies → 31-bit pack, all partition-local
  * with one clip held at a time. The oracle never decodes — it recomputes
  * every frame energy in closed form from the sample formula, so a
  * decoder that misread endianness or signedness, a framer that mis-tiled,
  * or a packer that flipped a comparison hash-mismatches. */
object AudioFp {

  private val Frames = 32; private val FrameLen = 64
  private val N = Frames * FrameLen

  /** sample(i) = gain · (((base·131 + i·7919) % 4001) − 2000), gain = 1
    * for even ids, 2 for odd — ±4000 peak, well inside 16-bit. */
  def synthFpWav(id: Long): Array[Byte] = {
    val base = (id / 2) * 2
    val gain = 1 + (id % 2).toInt
    val pcm = new Array[Byte](N * 2)
    var i = 0
    while (i < N) {
      val v = (java.lang.Math.floorMod(base * 131 + i.toLong * 7919, 4001L).toInt - 2000) * gain
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    graft.util.WavSpi.encode(pcm,
      new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false), N.toLong)
  }

  /** Decode + frame + pack. Bit f (0..30) set iff E(f+1) > E(f). None on
    * undecodable input or an unexpected shape. Decode goes through the
    * JVM-cached WAVE SPI ([[graft.util.WavSpi]]) — per-call AudioSystem
    * provider discovery serialized executor threads (70 s → 1.2 s on the
    * 10× probe). */
  def fingerprint(wav: Array[Byte]): Option[Long] = {
    val bytes =
      try {
        val ais = graft.util.WavSpi.open(wav)
        try ais.readAllBytes() finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => return None }
    if (bytes.length != N * 2) return None
    val energy = new Array[Long](Frames)
    var f = 0
    while (f < Frames) {
      var s = 0L
      var i = 0
      while (i < FrameLen) {
        val idx = (f * FrameLen + i) * 2
        val v = ((bytes(idx) & 0xff) | (bytes(idx + 1) << 8)).toShort.toLong
        s += v * v
        i += 1
      }
      energy(f) = s; f += 1
    }
    var fp = 0L
    f = 0
    while (f < Frames - 1) {
      if (energy(f + 1) > energy(f)) fp |= 1L << f
      f += 1
    }
    Some(fp)
  }

  /** Perceptual audio dedup through the gate: encode → real JDK decode →
    * energy contour → 31-bit fingerprint → buckets; clusters must be
    * exactly the planted gain-scaled pairs and every fingerprint must
    * match the oracle's closed-form frame energies. */
  def q222AudioFp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(ids =>
        ids.flatMap(id => fingerprint(synthFpWav(id)).map(fp => (id, fp))))
      .toDF("doc_id", "fp")
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_clips"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("fp"), col("min_doc"))
  }

  val q222Sql: String =
    """WITH g AS (SELECT doc_id, (doc_id // 2) * 2 AS base, 1 + doc_id % 2 AS gain FROM documents),
      |e AS (
      |  SELECT doc_id, ii.i // 64 AS f,
      |    sum(CAST(((base * 131 + ii.i * 7919) % 4001 - 2000) * gain AS BIGINT)
      |        * (((base * 131 + ii.i * 7919) % 4001 - 2000) * gain))::BIGINT AS energy
      |  FROM g, range(2048) ii(i)
      |  GROUP BY doc_id, ii.i // 64),
      |fp AS (
      |  SELECT a.doc_id,
      |    sum(CASE WHEN b.energy > a.energy THEN 1::BIGINT << a.f ELSE 0 END)::BIGINT AS fp
      |  FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.f = a.f + 1
      |  WHERE a.f < 31 GROUP BY a.doc_id)
      |SELECT fp, count(*)::BIGINT AS n_clips,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM fp GROUP BY fp ORDER BY fp, min_doc""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q222_audio_fp", q222AudioFp _, Some(q222Sql)),
  )
}
