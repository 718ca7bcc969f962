package org.apache.spark.sql.graftbridge

import java.awt.image.{BufferedImage, DataBufferByte, IndexColorModel}
import javax.imageio.{ImageIO, ImageWriter}

/** Shared encode plumbing for the real-codec fixture builders
  * ([[PngFixtureImage]], [[GifFixtureVideo]]).
  *
  * Two throughput decisions, both exactness-preserving:
  *
  *   - Frames are TYPE_BYTE_INDEXED over an identity 256-gray palette.
  *     Handing the PNG/GIF writers an RGB image makes them derive a
  *     palette by scanning pixels (GIF) or emit 3 bytes/px (PNG); an
  *     indexed image is written as-is — and stays EXACT: the decoder
  *     returns an indexed image whose `getRGB` is a stored-palette
  *     lookup, never a colorspace conversion (the gray-colorspace gamma
  *     warp only bites TYPE_BYTE_GRAY, which this deliberately avoids).
  *   - One `ImageWriter` per (thread, format), reused: the
  *     `ImageIO.getImageWritersByFormatName` registry walk per row
  *     dominated the per-clip cost at corpus scale. Writers are not
  *     thread-safe but are reusable after `reset()`; the ThreadLocal
  *     isolates them per executor thread.
  */
private[graftbridge] object GrayFixtureCodec {

  /** Identity gray palette: index i ↦ RGB(i, i, i). */
  private val grayModel: IndexColorModel = {
    val ramp = Array.tabulate[Byte](256)(i => i.toByte)
    new IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** A `rows × cols` cell grid rendered as `cellPx`-aligned uniform
    * blocks into a fresh indexed image; `cellGray(j)` ∈ [0, 255]. */
  def cellImage(rows: Int, cols: Int, cellPx: Int, cellGray: Int => Int): BufferedImage = {
    val w = cols * cellPx
    val img = new BufferedImage(w, rows * cellPx, BufferedImage.TYPE_BYTE_INDEXED, grayModel)
    val data = img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    var j = 0
    while (j < rows * cols) {
      val v = cellGray(j).toByte
      val x0 = (j % cols) * cellPx
      val base = (j / cols) * cellPx * w
      var dy = 0
      while (dy < cellPx) {
        java.util.Arrays.fill(data, base + dy * w + x0, base + dy * w + x0 + cellPx, v)
        dy += 1
      }
      j += 1
    }
    img
  }

  /** RGB variant of [[cellImage]] — for the PNG fixture ONLY. The JDK PNG
    * writer special-cases an identity-gray palette into an 8-bit GRAYSCALE
    * PNG, whose decode comes back as TYPE_BYTE_GRAY and `getRGB` then runs
    * the linear-gray → sRGB conversion — a gamma warp that breaks the
    * planted-value oracle (observed: g_sum/g_min/g_max mismatches). A
    * truecolor frame decodes back as RGB with no conversion; PNG deflate
    * of these tiny frames is cheap enough that losing the palette doesn't
    * matter. GIF has no such special case (its writer stores the palette
    * verbatim) and keeps the indexed fast path. */
  def cellImageRgb(rows: Int, cols: Int, cellPx: Int, cellGray: Int => Int): BufferedImage = {
    val w = cols * cellPx
    val img = new BufferedImage(w, rows * cellPx, BufferedImage.TYPE_INT_RGB)
    val data = img.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferInt].getData
    var j = 0
    while (j < rows * cols) {
      val v = cellGray(j)
      val rgb = (v << 16) | (v << 8) | v
      val x0 = (j % cols) * cellPx
      val base = (j / cols) * cellPx * w
      var dy = 0
      while (dy < cellPx) {
        java.util.Arrays.fill(data, base + dy * w + x0, base + dy * w + x0 + cellPx, rgb)
        dy += 1
      }
      j += 1
    }
    img
  }

  private def writerFor(format: String) = new ThreadLocal[ImageWriter] {
    override def initialValue(): ImageWriter =
      ImageIO.getImageWritersByFormatName(format).next()
  }

  private val pngWriter = writerFor("png")
  private val gifWriter = writerFor("gif")

  def encodePng(img: BufferedImage): Array[Byte] = {
    val w = pngWriter.get()
    val bos = new java.io.ByteArrayOutputStream(1024)
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.write(img)
    } finally { w.reset(); ios.close() }
    bos.toByteArray
  }

  /** Encode a frame sequence as one animated GIF. */
  def encodeGif(frames: Iterator[BufferedImage]): Array[Byte] = {
    val w = gifWriter.get()
    val bos = new java.io.ByteArrayOutputStream(4096)
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      frames.foreach { img =>
        val param = w.getDefaultWriteParam
        val meta = w.getDefaultImageMetadata(new javax.imageio.ImageTypeSpecifier(img), param)
        w.writeToSequence(new javax.imageio.IIOImage(img, null, meta), param)
      }
      w.endWriteSequence()
    } finally { w.reset(); ios.close() }
    bos.toByteArray
  }
}
