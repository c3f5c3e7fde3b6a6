package graft.ext

import graft.SparkSpec

/** Multimodal binary plumbing: schema, partition-local decode, feature
  * shape (decode itself is a documented deterministic stub — no codecs in
  * the container). */
class MultimodalSpec extends SparkSpec {

  import Multimodal._

  test("binary payloads flow through partition-local decode to features") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "image/png", Array[Byte](0, 10, 20, 30)),
      MediaRow(2L, "audio/wav", Array[Byte](-1, -128)),
      MediaRow(3L, "image/png", Array.emptyByteArray),
    ).toDS().repartition(2)
    val feats = extractFeatures(rows).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(feats(0).n_bytes == 4 && feats(0).feature.length == 4)
    assert(feats(0).feature(0) == 15.0f)              // mean byte value
    assert(feats(1).feature(2) == 255.0f)             // max of unsigned bytes
    assert(feats(2).n_bytes == 0)                     // empty payload safe
  }

  test("frame sampling expands videos to every k-th frame with offsets") {
    import spark.implicits._
    // 10 "frames" of 4 bytes each
    val payload = (0 until 40).map(_.toByte).toArray
    val vids = Seq(MediaRow(7L, "video/mp4", payload),
                   MediaRow(8L, "video/mp4", Array[Byte](1, 2))).toDS()
    val frames = sampleFrames(vids, frameBytes = 4, everyNth = 3, numPartitions = 2)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    assert(frames.map(f => (f.media_id, f.frame_idx, f.offset)).toSeq ==
      Seq((7L, 0, 0L), (7L, 3, 12L), (7L, 6, 24L), (7L, 9, 36L)))
    assert(frames(1).frame.toSeq == Seq[Byte](12, 13, 14, 15))
    assert(!frames.exists(_.media_id == 8L))   // sub-frame payload → no frames
  }

  test("batched resize keeps ids and reshapes features") {
    import spark.implicits._
    val feats = (1L to 150L).map(i =>
      MediaFeatures(i, "image/png", 4, Array(i.toFloat, 2f, 3f, 4f))).toDS()
    val out = resizeBatched(feats, targetDim = 2, batchSize = 64)
      .collect().sortBy(_.media_id)
    assert(out.length == 150)
    assert(out.forall(_.feature.length == 2))
    assert(out(41).feature(0) == 42.0f)
  }

  test("SQL surface: registered native functions work via spark.sql") {
    graft.functions.GraftFunctions.register(spark)
    val cos = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
      "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").collect()(0).getDouble(0)
    assert(cos == 1.0)
    val sig = spark.sql(
      "SELECT minhash_shingle_sig(array('a','b','c','d')) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sig.length == 16 && sig.forall(_ >= 0))
  }
}
