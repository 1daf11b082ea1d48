package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO

/** Planted image fixtures for the real-codec oracle check (q113).
  *
  * Two *independent* constructions of the same media:
  *  - BMPs are hand-written byte-by-byte from the published BITMAPFILEHEADER /
  *    BITMAPINFOHEADER layout (no ImageIO on the encode side) — so the Spark
  *    side's `javax.imageio` decode is checked against a spec-derived byte
  *    construction, and the DuckDB oracle re-parses the same bytes with
  *    little-endian offset arithmetic (width @18, height @22, first pixel
  *    B,G,R @54).
  *  - PNGs are `ImageIO`-encoded solid-color images; the oracle parses the
  *    IHDR dimensions big-endian at byte offsets 16/20 (8-byte signature +
  *    4-byte length + "IHDR"), checking the JDK encoder's header against the
  *    PNG spec, and checks the decode→pixel path against the planted color.
  *  - Two undecodable blobs (non-image bytes, empty) exercise the
  *    skip-don't-crash contract: all-NULL metadata, no exception.
  *
  * Everything is deterministic arithmetic in the image index — no RNG, no
  * timestamps — so the fixture is stable across JVMs and replayable by the
  * DuckDB oracle and `scripts/golden_check.py` alike.
  */
object PlantedImages {

  final case class Planted(id: Long, kind: String, w: Int, h: Int,
                           r: Int, g: Int, b: Int, blob: Array[Byte])

  /** Hand-written 24-bit uncompressed (BI_RGB) BMP: 14-byte file header,
    * 40-byte info header, bottom-up rows of B,G,R padded to 4 bytes.
    */
  def bmpBytes(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val size = 54 + stride * h
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    buf.putInt(0).putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { buf.put(b.toByte).put(g.toByte).put(r.toByte); x += 1 }
      var p = w * 3
      while (p < stride) { buf.put(0.toByte); p += 1 }
      y += 1
    }
    buf.array()
  }

  /** JDK-encoded solid-color PNG (the writer emits no timestamps — stable). */
  def pngBytes(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The planted set: 10 BMPs, 6 PNGs, 2 undecodables. Dimensions and colors
    * are fixed arithmetic in the index (documented here, replayed by the
    * oracle's VALUES literals).
    */
  val all: Seq[Planted] = {
    val bmps = (0 until 10).map { i =>
      val w = 3 + i % 6; val h = 2 + (i * 7) % 5
      val r = (i * 37 + 11) % 256; val g = (i * 59 + 23) % 256; val b = (i * 83 + 5) % 256
      Planted(i.toLong, "bmp", w, h, r, g, b, bmpBytes(w, h, r, g, b))
    }
    val pngs = (0 until 6).map { i =>
      val w = 5 + i % 7; val h = 3 + (i * 3) % 6
      val r = (i * 41 + 7) % 256; val g = (i * 67 + 31) % 256; val b = (i * 29 + 3) % 256
      Planted(100L + i, "png", w, h, r, g, b, pngBytes(w, h, r, g, b))
    }
    val bad = Seq(
      Planted(200L, "bad", 0, 0, 0, 0, 0,
        Array.tabulate(64)(j => ((j * 131 + 17) % 256).toByte)),
      Planted(201L, "bad", 0, 0, 0, 0, 0, Array.empty[Byte]))
    bmps ++ pngs ++ bad
  }

  /** Lowercase hex of a blob — shared by all planted-fixture oracles. */
  private[multimodal] def hex(bs: Array[Byte]): String =
    bs.map(b => f"${b & 0xff}%02x").mkString

  /** `(id, kind, hex(blob), planted r, g, b)` VALUES rows for the oracle. */
  def sqlValues: String =
    all.map(p => s"(${p.id}, '${p.kind}', '${hex(p.blob)}', ${p.r}, ${p.g}, ${p.b})")
      .mkString(",\n    ")
}
