package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real, dependency-free image codec on `javax.imageio` (JDK built-in
  * readers: PNG / JPEG / BMP / GIF / WBMP).
  *
  * Pixels are handled as raw raster SAMPLES, not `getRGB` values: on
  * gray images `getRGB` applies a linear-gray→sRGB colorspace remap that
  * breaks exact encode→decode roundtrips, while raster samples survive a
  * PNG roundtrip bit-exactly (PNG is lossless). A pixel is one 0-255 int:
  * the single band for gray images, the integer mean of the first three
  * bands for color; >8-bit samples are right-shifted to 8 bits.
  *
  * Everything here is driver/executor-side JVM code with no Spark
  * dependency — [[Multimodal]] wires it into per-partition batch maps.
  */
object ImageCodec {

  // one-time: keep ImageIO off its temp-file disk cache (per-call file IO
  // would dominate decode cost in a tight per-partition loop)
  ImageIO.setUseCache(false)

  final case class Decoded(width: Int, height: Int, format: String,
                           pixels: Array[Int])

  /** Cheap magic-byte sniff so non-image payloads never pay an ImageIO
    * reader probe (the common case in a mixed binary column at scale).
    */
  def sniffFormat(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 4) return None
    def b(i: Int) = bytes(i) & 0xff
    if (b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') Some("png")
    else if (b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff) Some("jpeg")
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') Some("gif")
    else if (b(0) == 'B' && b(1) == 'M') Some("bmp")
    else None
  }

  /** Decode an image payload to true dimensions + 8-bit pixel samples.
    * None for anything the sniff or the JDK readers reject.
    */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    sniffFormat(bytes).flatMap { fmt =>
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        val bands = raster.getNumBands
        val depth = img.getColorModel.getComponentSize(0)
        val shift = math.max(0, depth - 8)
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v =
              if (bands >= 3)
                ((raster.getSample(x, y, 0) >> shift) +
                 (raster.getSample(x, y, 1) >> shift) +
                 (raster.getSample(x, y, 2) >> shift)) / 3
              else raster.getSample(x, y, 0) >> shift
            px(y * w + x) = v
            x += 1
          }
          y += 1
        }
        Some(Decoded(w, h, fmt, px))
      }
    }

  /** Encode an 8-bit gray pixel function as a PNG (lossless roundtrip). */
  def encodePng(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = gray(x, y) & 0xff; x += 1 }
      y += 1
    }
    encodePngPixels(w, h, px)
  }

  /** Encode an 8-bit gray pixel array (row-major) as a PNG. */
  def encodePngPixels(w: Int, h: Int, pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == w * h, s"pixel buffer ${pixels.length} != $w x $h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixels(y * w + x) & 0xff); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Bilinear resample (align-corners mapping; rounds half up). A
    * constant image resamples to exactly that constant, so the arithmetic
    * is oracle-checkable end-to-end through a PNG re-encode.
    */
  def resizeBilinear(d: Decoded, tw: Int, th: Int): Array[Int] = {
    require(tw > 0 && th > 0, "target dims must be positive")
    val out = new Array[Int](tw * th)
    val sx = if (tw > 1) (d.width - 1).toDouble / (tw - 1) else 0.0
    val sy = if (th > 1) (d.height - 1).toDouble / (th - 1) else 0.0
    var y = 0
    while (y < th) {
      val fy = y * sy
      val y0 = math.min(fy.toInt, d.height - 1)
      val y1 = math.min(y0 + 1, d.height - 1)
      val wy = fy - y0
      var x = 0
      while (x < tw) {
        val fx = x * sx
        val x0 = math.min(fx.toInt, d.width - 1)
        val x1 = math.min(x0 + 1, d.width - 1)
        val wx = fx - x0
        val v =
          d.pixels(y0 * d.width + x0) * (1 - wx) * (1 - wy) +
          d.pixels(y0 * d.width + x1) * wx * (1 - wy) +
          d.pixels(y1 * d.width + x0) * (1 - wx) * wy +
          d.pixels(y1 * d.width + x1) * wx * wy
        out(y * tw + x) = math.min(255, math.max(0, (v + 0.5).toInt))
        x += 1
      }
      y += 1
    }
    out
  }
}
