package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL image codec behind [[Multimodal]]'s batch contract — pure-JVM
  * `javax.imageio` (PNG / BMP / GIF / JPEG / TIFF readers and writers
  * ship with the JDK; no native libraries, fully headless). This closes
  * the round-3..6 "codec is a deterministic fake" gap for image media:
  * the fake remains the oracle-checkable default (q46/q47/q90/q91 hash
  * rows are unchanged), and this codec plugs into the same
  * `mapPartitions` batch APIs via their codec parameters.
  *
  * Determinism: header metadata comes from the format reader without a
  * full decode; resampling is nearest-neighbor and pooling is
  * block-mean — plain integer/double arithmetic on the decoded pixels,
  * no Java2D rasterizer — and the PNG re-encode is the JDK writer,
  * which emits no timestamps. Undecodable blobs yield null (the
  * pipeline's skip-don't-crash contract for corrupt corpus media).
  */
object ImageIo {

  /** Full decode; None for null/empty/undecodable blobs — including
    * recognized-but-corrupt media, where `ImageIO.read` finds a reader
    * and then THROWS on the damaged pixel stream (e.g. a valid PNG
    * signature over truncated IDAT data). Swallowing that into None is
    * the skip-don't-crash contract: on a 1000-executor job, one corrupt
    * blob must cost a null row, not a task-retry storm.
    */
  def decode(blob: Array[Byte]): Option[BufferedImage] =
    if (blob == null || blob.length == 0) None
    else try Option(ImageIO.read(new ByteArrayInputStream(blob)))
    catch { case _: java.io.IOException | _: RuntimeException => None }

  /** Exact integer Σ(r+g+b) over the image's own raster. */
  def rgbSum(img: BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Header-only metadata (width, height, format): the reader parses the
    * header without decoding pixel data — the shape a 100 TB metadata
    * sweep needs (bytes read per blob ~ header size, not image size).
    */
  def meta(blob: Array[Byte]): Option[(Int, Int, String)] = {
    if (blob == null || blob.length == 0) return None
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(blob))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          Some((r.getWidth(0), r.getHeight(0),
            r.getFormatName.toLowerCase(java.util.Locale.ROOT)))
        } catch {
          // recognized container, corrupt header — skip, don't crash
          case _: java.io.IOException | _: RuntimeException => None
        } finally r.dispose()
      }
    } finally iis.close()
  }

  /** Nearest-neighbor resample to (w, h), re-encoded as PNG; null when
    * the blob does not decode. Plugs into [[Multimodal.resizeBlobs]].
    */
  def resize(blob: Array[Byte], w: Int, h: Int): Array[Byte] =
    decode(blob).map { img =>
      val (sw, sh) = (img.getWidth, img.getHeight)
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        val sy = math.min(sh - 1, y.toLong * sh / h).toInt
        var x = 0
        while (x < w) {
          val sx = math.min(sw - 1, x.toLong * sw / w).toInt
          out.setRGB(x, y, img.getRGB(sx, sy))
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(out, "png", bos)
      bos.toByteArray
    }.orNull

  /** Block-mean luminance features on a ceil-sqrt grid: feature j is the
    * mean of (r+g+b)/765 over cell (j % g, j / g) of a g×g tiling,
    * g = ⌈√dim⌉ — exact integer sums, one double division, in [0,1].
    * Null when the blob does not decode. Plugs into
    * [[Multimodal.extractFeatures]].
    */
  def features(blob: Array[Byte], dim: Int): Array[Float] =
    decode(blob).map { img =>
      val (wI, hI) = (img.getWidth, img.getHeight)
      val g = math.ceil(math.sqrt(dim.toDouble)).toInt
      Array.tabulate(dim) { j =>
        val cx = j % g; val cy = j / g
        val x0 = math.min(cx * wI / g, wI - 1)
        val x1 = math.max(x0 + 1, (cx + 1) * wI / g)
        val y0 = math.min(cy * hI / g, hI - 1)
        val y1 = math.max(y0 + 1, (cy + 1) * hI / g)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        (sum.toDouble / (765.0 * (x1 - x0) * (y1 - y0))).toFloat
      }
    }.orNull

  /** Real full-decode stats in the [[Multimodal]] batch shape:
    * (id, width, height, format, rgb_sum, n_px) — `rgb_sum` is the exact
    * integer Σ(r+g+b) over all decoded pixels (no float rounding, so a
    * byte-level oracle reproduces it bit-for-bit), nulls for undecodable
    * blobs. Format name comes from the header reader, pixels from the
    * full decode — one codec init per partition.
    */
  def imageStats(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType),
      StructField("rgb_sum", LongType),
      StructField("n_px", LongType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    df.select(col(idCol).cast("long"), col(blobCol)).mapPartitions { rows =>
      rows.map { r =>
        val blob = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        (meta(blob), decode(blob)) match {
          // pixel sums iterate the DECODED raster's own dims; a blob
          // whose header claims different dims than its raster decodes
          // to (malformed) is treated as corrupt — null row, never an
          // out-of-bounds getRGB crash inside a task
          case (Some((w, h, f)), Some(img))
              if img.getWidth == w && img.getHeight == h =>
            Row(r.getLong(0), w, h, f, rgbSum(img), w.toLong * h)
          case _ => Row(r.getLong(0), null, null, null, null, null)
        }
      }
    }(encoder)
  }

  /** Real header-metadata scan in the [[Multimodal]] batch shape:
    * (id, width, height, format), nulls for undecodable blobs.
    */
  def imageMeta(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    df.select(col(idCol).cast("long"), col(blobCol)).mapPartitions { rows =>
      rows.map { r =>
        val blob = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        meta(blob) match {
          case Some((w, h, f)) => Row(r.getLong(0), w, h, f)
          case None            => Row(r.getLong(0), null, null, null)
        }
      }
    }(encoder)
  }
}
