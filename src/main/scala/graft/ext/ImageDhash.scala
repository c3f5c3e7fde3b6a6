package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Perceptual image near-dup via difference hash (dHash) — the
  * embedding-free image dedup a multimodal curation pipeline runs before
  * any model touches pixels: decode, downsample to a 9×8 grid, emit one
  * bit per horizontal neighbor comparison (64 bits), and bucket by the
  * hash. Robust to uniform brightness shifts BY CONSTRUCTION (both sides
  * of every comparison shift together) — which the gate data exploits:
  * docs are planted in pairs (even id = base image, odd id = the same
  * image +1 brightness), and the query must cluster exactly those pairs.
  *
  * The Spark side is the REAL pipeline: encode ([[synthDhashPng]]) →
  * JDK PNG decode → block-sum downsample → bit pack, all partition-local
  * with one image held at a time; the per-hash cluster aggregate is
  * map-side combined. The oracle never decodes — it recomputes every
  * 8×8-block sum in closed form from the pixel formula, so a decoder
  * that misread raster order, a downsampler that mis-tiled blocks, or a
  * packer that put a bit in the wrong half hash-mismatches. */
object ImageDhash {

  private val W = 72; private val H = 64 // 9×8 grid of 8×8 blocks

  /** Deterministic grayscale test image: pixel(x,y) =
    * ((x·7 + y·13 + base·31) % 251) + odd, base = the pair's even id.
    * The +1 on odd ids shifts every pixel uniformly — same dHash. */
  def synthDhashPng(id: Long): Array[Byte] = {
    val base = (id / 2) * 2
    val odd = (id % 2).toInt
    val im = new java.awt.image.BufferedImage(W, H,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = im.getRaster
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) {
        raster.setSample(x, y, 0,
          (java.lang.Math.floorMod(x.toLong * 7 + y.toLong * 13 + base * 31, 251L) + odd).toInt)
        x += 1
      }
      y += 1
    }
    graft.util.PngSpi.write(im)
  }

  /** Decode + downsample + pack. Returns (lo, hi): bits of rows 0-3 in
    * `lo`, rows 4-7 in `hi` (32 bits each — two signed BIGINTs avoid the
    * sign bit a single 64-bit pack would hit). None on undecodable. */
  def dhash(png: Array[Byte]): Option[(Long, Long)] = {
    // cached PNG reader SPI: ImageIO.read's per-call registry lookup
    // serializes local[32] threads (the q222 WavSpi lesson, milder here)
    graft.util.PngSpi.read(png).filter(i => i.getWidth == W && i.getHeight == H).map { im =>
      val raster = im.getRaster
      val cell = Array.ofDim[Long](8, 9)
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 9) {
          var s = 0L
          var dy = 0
          while (dy < 8) {
            var dx = 0
            while (dx < 8) { s += raster.getSample(c * 8 + dx, r * 8 + dy, 0); dx += 1 }
            dy += 1
          }
          cell(r)(c) = s; c += 1
        }
        r += 1
      }
      var lo = 0L; var hi = 0L
      r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (cell(r)(c) < cell(r)(c + 1)) {
            if (r < 4) lo |= 1L << (r * 8 + c) else hi |= 1L << ((r - 4) * 8 + c)
          }
          c += 1
        }
        r += 1
      }
      (lo, hi)
    }
  }

  /** Perceptual dedup through the gate: encode → decode → dHash → bucket;
    * per-hash clusters (size, id range) must be exactly the planted
    * brightness-shift pairs, with both 32-bit halves matching the
    * oracle's closed-form block sums. */
  def q221ImageDhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.flatMap(id => dhash(synthDhashPng(id)).map { case (lo, hi) => (id, lo, hi) })
      }
      .toDF("doc_id", "dhash_lo", "dhash_hi")
      .groupBy(col("dhash_hi"), col("dhash_lo"))
      .agg(count(lit(1)).as("n_imgs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("dhash_hi"), col("dhash_lo"), col("min_doc"))
  }

  val q221Sql: String =
    """WITH g AS (SELECT doc_id, (doc_id // 2) * 2 AS base, doc_id % 2 AS odd FROM documents),
      |cells AS (
      |  SELECT doc_id, rr.r, cc.c,
      |    sum(((cc.c * 8 + dxx.dx) * 7 + (rr.r * 8 + dyy.dy) * 13 + base * 31) % 251
      |        + odd)::BIGINT AS s
      |  FROM g, range(8) rr(r), range(9) cc(c), range(8) dyy(dy), range(8) dxx(dx)
      |  GROUP BY doc_id, rr.r, cc.c),
      |bits AS (
      |  SELECT a.doc_id, a.r, a.c, CASE WHEN a.s < b.s THEN 1 ELSE 0 END AS bit
      |  FROM cells a JOIN cells b ON a.doc_id = b.doc_id AND a.r = b.r AND b.c = a.c + 1
      |  WHERE a.c < 8),
      |h AS (
      |  SELECT doc_id,
      |    sum(CASE WHEN r < 4 THEN bit::BIGINT << (r * 8 + c) ELSE 0 END)::BIGINT AS dhash_lo,
      |    sum(CASE WHEN r >= 4 THEN bit::BIGINT << ((r - 4) * 8 + c) ELSE 0 END)::BIGINT AS dhash_hi
      |  FROM bits GROUP BY doc_id)
      |SELECT dhash_hi, dhash_lo, count(*)::BIGINT AS n_imgs,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM h GROUP BY dhash_hi, dhash_lo ORDER BY dhash_hi, dhash_lo, min_doc""".stripMargin

  // ------------------------------------------------------------- q223: banded near-dup pairs
  /** NEAR-duplicate image pairs at Hamming ≤ 3 over the dHash — exact
    * bucket equality (q221) misses a re-encode that flips a couple of
    * comparison bits, so this is the image twin of q144's SimHash bands:
    * the 64 bits split into 4×16-bit bands, pairs sharing ANY band are
    * candidates (pigeonhole: ≤ 3 flipped bits can spoil at most 3 of 4
    * bands — the candidate set is provably complete for the threshold),
    * and the exact popcount verify runs on candidates only. Gate data
    * plants odd ids as base + one brightened 8×8 block + uniform +1:
    * exactly the ≤ 2-bit flip a crop/re-encode causes, which exact
    * bucketing may miss but the banded join must catch. Scale: band
    * buckets are hash-distributed; candidate volume is Σ|bucket|², the
    * LSH contract; nothing all-pairs. */
  def q223ImageNeardup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.flatMap(id => dhash(synthNeardupPng(id)).map { case (lo, hi) => (id, lo, hi) })
      }
      .toDF("doc_id", "lo", "hi")
    val bands = hashes.select(col("doc_id"), col("lo"), col("hi"),
      posexplode(array(
        col("lo").bitwiseAND(lit(0xffffL)),
        shiftrightunsigned(col("lo"), 16).bitwiseAND(lit(0xffffL)),
        col("hi").bitwiseAND(lit(0xffffL)),
        shiftrightunsigned(col("hi"), 16).bitwiseAND(lit(0xffffL)))).as(Seq("b", "bv")))
    bands.as("a").join(bands.as("b"),
        col("a.b") === col("b.b") && col("a.bv") === col("b.bv") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.lo").as("lo1"), col("a.hi").as("hi1"),
        col("b.lo").as("lo2"), col("b.hi").as("hi2"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("lo1").bitwiseXOR(col("lo2"))) +
        bit_count(col("hi1").bitwiseXOR(col("hi2"))))
      .filter(col("hamming") <= 3)
      .select(col("d1"), col("d2"), col("hamming").cast("long").as("hamming"))
      .orderBy(col("d1"), col("d2"))
  }

  /** q223's synth: odd ids get ONE brightened 8×8 block (r=2, c=3, +40
    * per pixel) on top of the pair's base image plus a uniform +1 — the
    * block shifts two adjacent cell comparisons, the uniform part none,
    * so the planted pair sits at Hamming ≤ 2 of the base's dHash without
    * equalling it (usually). Base pixels are scaled to %200 so the +41
    * peak stays in 8-bit range. */
  def synthNeardupPng(id: Long): Array[Byte] = {
    val base = (id / 2) * 2
    val odd = (id % 2).toInt
    val im = new java.awt.image.BufferedImage(W, H,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = im.getRaster
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) {
        val inBlock = odd == 1 && y >= 16 && y < 24 && x >= 24 && x < 32
        // the gradient STRIDE mixes in the base id: a fixed-stride ramp
        // gives near-identical contours (hence dHashes) across bases —
        // measured 632k incidental pairs at sf0.1; per-base strides make
        // contours distinct so the pair table is planted-pairs + a thin
        // tail of true near-collisions
        val p = java.lang.Math.floorMod(
          (x.toLong * 7 + y.toLong * 13) * (1 + base % 89) + base * 31, 200L).toInt +
          odd + (if (inBlock) 40 else 0)
        raster.setSample(x, y, 0, p)
        x += 1
      }
      y += 1
    }
    graft.util.PngSpi.write(im)
  }

  val q223Sql: String =
    """WITH g AS (SELECT doc_id, (doc_id // 2) * 2 AS base, doc_id % 2 AS odd FROM documents),
      |cells AS (
      |  SELECT doc_id, rr.r, cc.c,
      |    sum(((((cc.c * 8 + dxx.dx) * 7 + (rr.r * 8 + dyy.dy) * 13) * (1 + base % 89)
      |          + base * 31) % 200)
      |        + odd
      |        + CASE WHEN odd = 1 AND rr.r = 2 AND cc.c = 3 THEN 40 ELSE 0 END)::BIGINT AS s
      |  FROM g, range(8) rr(r), range(9) cc(c), range(8) dyy(dy), range(8) dxx(dx)
      |  GROUP BY doc_id, rr.r, cc.c),
      |bits AS (
      |  SELECT a.doc_id, a.r, a.c, CASE WHEN a.s < b.s THEN 1 ELSE 0 END AS bit
      |  FROM cells a JOIN cells b ON a.doc_id = b.doc_id AND a.r = b.r AND b.c = a.c + 1
      |  WHERE a.c < 8),
      |h AS (
      |  SELECT doc_id,
      |    sum(CASE WHEN r < 4 THEN bit::BIGINT << (r * 8 + c) ELSE 0 END)::BIGINT AS lo,
      |    sum(CASE WHEN r >= 4 THEN bit::BIGINT << ((r - 4) * 8 + c) ELSE 0 END)::BIGINT AS hi
      |  FROM bits GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, lo, hi, b.b,
      |    CASE b.b WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
      |             WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS bv
      |  FROM h, range(4) b(b)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
      |    a.lo AS lo1, a.hi AS hi1, b.lo AS lo2, b.hi AS hi2
      |  FROM bands a JOIN bands b
      |    ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id)
      |SELECT d1, d2,
      |  (bit_count(xor(lo1, lo2)) + bit_count(xor(hi1, hi2)))::BIGINT AS hamming
      |FROM cand
      |WHERE bit_count(xor(lo1, lo2)) + bit_count(xor(hi1, hi2)) <= 3
      |ORDER BY d1, d2""".stripMargin

  // ------------------------------------------------------------- q225: cross-modal dedup
  /** Cross-modality duplicate audit: pages whose IMAGERY is
    * near-duplicated (q223's banded dHash pairs) scored by how similar
    * their TEXT is (q144's 60-bit SimHash distance) — the curation
    * signal for template farms and re-branded mirrors, where a page's
    * text is rewritten but its images are lifted verbatim. `img_only`
    * flags pairs past q144's text threshold: duplicated imagery, unique
    * prose — exactly the pages a text-only dedup pass would wrongly
    * keep as distinct.
    *
    * Pure composition of two bucketed paths — no new kernel, no
    * all-pairs anywhere: the image side is the 4×16-bit band LSH join
    * (candidate volume Σ|bucket|²), the text side one map-only SimHash
    * pass joined to the (much smaller) pair table on doc_id. The oracle
    * recomputes BOTH signatures from first principles, so the gate
    * covers the join wiring and every per-pair distance value, not just
    * the boolean. */
  def q225CrossmodalDedup(s: SparkSession, dir: String): DataFrame = {
    val sigs = Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.simhash60(split(col("text"), " ")).as("tsh"))
    q223ImageNeardup(s, dir)
      .withColumnRenamed("hamming", "img_hamming")
      .join(sigs.select(col("doc_id").as("d1"), col("tsh").as("t1")), Seq("d1"))
      .join(sigs.select(col("doc_id").as("d2"), col("tsh").as("t2")), Seq("d2"))
      .withColumn("text_hamming",
        bit_count(col("t1").bitwiseXOR(col("t2"))).cast("long"))
      .select(col("d1"), col("d2"), col("img_hamming"), col("text_hamming"),
        (col("text_hamming") > 5).as("img_only"))
      .orderBy(col("d1"), col("d2"))
  }

  val q225Sql: String = {
    // q223's image-pair CTEs verbatim + q144's text-SimHash CTEs
    // (renamed ttoks/ttv/tc/tsig to avoid colliding with the image
    // `bits` CTE), joined on the pair's doc ids
    val imageCtes = q223Sql
      .stripSuffix("ORDER BY d1, d2")
      .replaceFirst("(?s)SELECT d1, d2,.*$", "") // drop q223's final SELECT
      .trim.stripSuffix(",") // normalize, then rejoin the CTE chain below
    s"""$imageCtes,
       |pairs AS (
       |  SELECT d1, d2,
       |    (bit_count(xor(lo1, lo2)) + bit_count(xor(hi1, hi2)))::BIGINT AS img_hamming
       |  FROM cand
       |  WHERE bit_count(xor(lo1, lo2)) + bit_count(xor(hi1, hi2)) <= 3),
       |ttoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |ttv AS (SELECT doc_id, ${graft.functions.TextHash.tokvalSql("tok")} AS tv FROM ttoks),
       |tc AS (SELECT doc_id, t.j,
       |         sum(CASE WHEN (tv * (t.j * 2 + 3)) % 65536 >= 32768 THEN 1 ELSE -1 END) AS csum
       |       FROM ttv CROSS JOIN range(60) t(j) GROUP BY doc_id, t.j),
       |tsig AS (SELECT doc_id, sum(CASE WHEN csum > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS sh
       |         FROM tc GROUP BY doc_id)
       |SELECT p.d1, p.d2, p.img_hamming,
       |  bit_count(xor(a.sh, b.sh))::BIGINT AS text_hamming,
       |  bit_count(xor(a.sh, b.sh)) > 5 AS img_only
       |FROM pairs p JOIN tsig a ON a.doc_id = p.d1 JOIN tsig b ON b.doc_id = p.d2
       |ORDER BY p.d1, p.d2""".stripMargin
  }

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q221_image_dhash", q221ImageDhash _, Some(q221Sql)),
    ("q223_image_neardup", q223ImageNeardup _, Some(q223Sql)),
    ("q225_crossmodal_dedup", q225CrossmodalDedup _, Some(q225Sql)),
  )
}
