package graft.tools

/** Throwaway harness: PNG encode+decode per-image cost, ImageIO registry
  * path vs cached-SPI path, under thread counts matching local[32]. */
object PngBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(20000)
    val threads = 32
    def run(tag: String, enc: java.awt.image.BufferedImage => Array[Byte],
            dec: Array[Byte] => Option[java.awt.image.BufferedImage]): Unit = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val futs = (0 until threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = t
            while (i < n) {
              val png = enc(MultimodalBridge.synthGray(i.toLong))
              val im = dec(png)
              require(im.exists(_.getWidth == 72), s"decode failed at $i")
              i += threads
            }
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-10s n=$n $sec%.2f s  ${sec / n * 1e6}%.1f us/img")
    }
    def imageioEnc(im: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(4096)
      javax.imageio.ImageIO.setUseCache(false)
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    def imageioDec(b: Array[Byte]): Option[java.awt.image.BufferedImage] =
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
    // warmup
    run("warm-io", imageioEnc, imageioDec)
    run("warm-spi", graft.util.PngSpi.write, graft.util.PngSpi.read)
    run("imageio", imageioEnc, imageioDec)
    run("pngspi", graft.util.PngSpi.write, graft.util.PngSpi.read)
    run("imageio2", imageioEnc, imageioDec)
    run("pngspi2", graft.util.PngSpi.write, graft.util.PngSpi.read)
  }
}

object MultimodalBridge {
  def synthGray(seed: Long): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(72, 64,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = im.getRaster
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 72) {
        raster.setSample(x, y, 0,
          java.lang.Math.floorMod(seed * 31 + y * 72L + x, 251L).toInt)
        x += 1
      }
      y += 1
    }
    im
  }
}
