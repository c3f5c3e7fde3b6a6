package graft.util

/** JVM-cached PNG codec SPIs — the [[WavSpi]] pattern for ImageIO.
  * `ImageIO.read`/`ImageIO.write` consult the IIORegistry on EVERY call
  * (provider iteration + per-call stream-signature probing under the
  * registry's category locks), and under local[32] that shared-registry
  * traffic serializes executor threads the same way the audio SPI path
  * did (q222: 0.93 ms/clip → 0.27 ms after caching). Here the lookup is
  * resolvable ONCE because the dHash pipeline knows its payloads are PNG
  * — no signature sniffing needed. The SPIs are thread-safe factories;
  * the per-call `createReaderInstance()` is plain object allocation.
  * Reader/writer instances are NOT thread-safe, so one is created and
  * disposed per call (their setup cost is negligible next to the codec
  * work). Callers fall back to the ImageIO path when a provider is
  * absent (exotic JREs). The general format-sniffing decode path
  * (`Multimodal.decodeImages`) intentionally stays on `ImageIO.read` —
  * it must dispatch GIF/BMP/PNG by content, which is exactly the
  * registry's job. */
object PngSpi {
  import scala.jdk.CollectionConverters._

  lazy val readerSpi: Option[javax.imageio.spi.ImageReaderSpi] =
    javax.imageio.spi.IIORegistry.getDefaultInstance
      .getServiceProviders(classOf[javax.imageio.spi.ImageReaderSpi], true)
      .asScala.find(_.getFormatNames.exists(_.equalsIgnoreCase("png")))

  lazy val writerSpi: Option[javax.imageio.spi.ImageWriterSpi] =
    javax.imageio.spi.IIORegistry.getDefaultInstance
      .getServiceProviders(classOf[javax.imageio.spi.ImageWriterSpi], true)
      .asScala.find(_.getFormatNames.exists(_.equalsIgnoreCase("png")))

  /** Decode a PNG payload through the cached reader SPI. None on
    * undecodable bytes (same contract as the ImageIO.read fallback:
    * corrupt blobs flag, they never kill a task). */
  def read(png: Array[Byte]): Option[java.awt.image.BufferedImage] =
    readerSpi match {
      case Some(spi) =>
        val r = spi.createReaderInstance()
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(png))
        try {
          r.setInput(iis, true, true)
          Some(r.read(0))
        } catch { case scala.util.control.NonFatal(_) => None }
        finally {
          r.dispose()
          // ImageIO.read closes its stream in a finally; an unclosed
          // MemoryCacheImageInputStream keeps its cache blocks live
          // until GC — at 500k images that is an old-gen storm
          try iis.close() catch { case scala.util.control.NonFatal(_) => () }
        }
      case None =>
        javax.imageio.ImageIO.setUseCache(false)
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png)))
        catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Encode an image as PNG through the cached writer SPI. */
  def write(im: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(im.getWidth * im.getHeight / 2 + 128)
    writerSpi match {
      case Some(spi) =>
        val w = spi.createWriterInstance()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        try {
          w.setOutput(ios)
          w.write(im)
        } finally {
          w.dispose()
          // close() flushes the remaining cached bytes to bos AND frees
          // the cache blocks (see the reader note above)
          try ios.close() catch { case scala.util.control.NonFatal(_) => () }
        }
      case None =>
        javax.imageio.ImageIO.setUseCache(false)
        javax.imageio.ImageIO.write(im, "png", bos)
    }
    bos.toByteArray
  }
}
