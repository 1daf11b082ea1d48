package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{ImageIo, Multimodal}

/** Real-codec path: javax.imageio decode behind the Multimodal batch
  * contract. Pixel-exact assertions on crafted PNG/BMP fixtures, null
  * contract for undecodable blobs, determinism under repartitioning.
  */
class ImageIoSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def bmp(w: Int, h: Int, color: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, color)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  test("meta reads real headers (png + bmp) without decoding; garbage -> null row") {
    val rows = Seq(
      (1L, png(8, 6)((_, _) => 0xff0000)),
      (2L, bmp(3, 5, 0x00ff00)),
      (3L, "not an image".getBytes("UTF-8")))
    val df = rows.toDF("id", "blob")
    val got = ImageIo.imageMeta(df, "id", "blob").orderBy("id").collect()
    assert((got(0).getInt(1), got(0).getInt(2), got(0).getString(3)) === ((8, 6, "png")))
    assert((got(1).getInt(1), got(1).getInt(2), got(1).getString(3)) === ((3, 5, "bmp")))
    assert(got(2).isNullAt(1) && got(2).isNullAt(3), "garbage blob must yield nulls")
  }

  test("resize: pixel-exact nearest-neighbor, PNG round-trip, idempotent") {
    // left half red, right half blue; 4x4 -> 2x2 keeps the halves
    val src = png(4, 4)((x, _) => if (x < 2) 0xff0000 else 0x0000ff)
    val out = ImageIo.resize(src, 2, 2)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(img.getWidth === 2 && img.getHeight === 2)
    assert((img.getRGB(0, 0) & 0xffffff) === 0xff0000)
    assert((img.getRGB(1, 1) & 0xffffff) === 0x0000ff)
    // resizing the already-resized PNG to the same dims is a fixpoint
    assert(java.util.Arrays.equals(ImageIo.resize(out, 2, 2), out))
    assert(ImageIo.resize("junk".getBytes, 2, 2) === null)
  }

  test("features: block-mean luminance, exact on solid images") {
    val black = ImageIo.features(png(8, 8)((_, _) => 0x000000), 16)
    val white = ImageIo.features(png(8, 8)((_, _) => 0xffffff), 16)
    assert(black.length === 16 && black.forall(_ === 0.0f))
    assert(white.length === 16 && white.forall(_ === 1.0f))
    // half-black/half-white 4x4 at dim 4 (2x2 grid): cells are solid
    val halves = ImageIo.features(png(4, 4)((x, _) => if (x < 2) 0 else 0xffffff), 4)
    assert(halves.toSeq === Seq(0.0f, 1.0f, 0.0f, 1.0f))
    assert(ImageIo.features("junk".getBytes, 4) === null)
  }

  test("plugs into the Multimodal batch APIs; deterministic under repartitioning") {
    val rows = (0L until 24L).map { i =>
      (i, png(8, 8)((x, y) => ((x * 32 + i.toInt) << 16) | (y * 32 << 8) | 64))
    } :+ ((99L, "corrupt".getBytes("UTF-8")))
    val df = rows.toDF("id", "blob")
    val a = Multimodal.extractFeatures(df, "id", "blob", 9, decode = ImageIo.features)
      .orderBy("id").collect()
    val b = Multimodal.extractFeatures(df.repartition(5), "id", "blob", 9,
        decode = ImageIo.features)
      .orderBy("id").collect()
    assert(a.map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getSeq[Float](1))).toSeq ===
      b.map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getSeq[Float](1))).toSeq)
    assert(a.last.isNullAt(1), "corrupt blob must carry null features")
    assert(a.take(24).forall(r => r.getSeq[Float](1).length == 9))
    val r1 = Multimodal.resizeBlobs(df, "id", "blob", 4, 4, resample = ImageIo.resize)
      .orderBy("id").collect()
    assert(r1.take(24).forall { r =>
      val img = ImageIO.read(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      img.getWidth == 4 && img.getHeight == 4
    })
    assert(r1.last.isNullAt(1))
  }

  test("imageStats on planted fixtures: spec-written BMPs decode to planted dims/colors") {
    import graft.multimodal.PlantedImages
    val df = PlantedImages.all.map(p => (p.id, p.blob)).toDF("id", "blob")
    val got = ImageIo.imageStats(df, "id", "blob").orderBy("id").collect()
      .map(r => r.getLong(0) -> r).toMap
    PlantedImages.all.foreach { p =>
      val r = got(p.id)
      if (p.kind == "bad") {
        assert(r.isNullAt(1) && r.isNullAt(3) && r.isNullAt(4),
          s"undecodable id=${p.id} must be all-null")
      } else {
        assert(r.getInt(1) === p.w && r.getInt(2) === p.h, s"dims id=${p.id}")
        assert(r.getString(3) === p.kind, s"format id=${p.id}")
        assert(r.getLong(4) === (p.r + p.g + p.b).toLong * p.w * p.h,
          s"exact pixel sum id=${p.id}")
        assert(r.getLong(5) === p.w.toLong * p.h)
      }
    }
    // the hand-written BMP bytes carry the documented header layout
    val b0 = PlantedImages.all.head
    assert(b0.blob(0) === 'B'.toByte && b0.blob(1) === 'M'.toByte)
    assert((b0.blob(18) & 0xff) === b0.w && (b0.blob(22) & 0xff) === b0.h)
    assert((b0.blob(54) & 0xff, b0.blob(55) & 0xff, b0.blob(56) & 0xff) ===
      ((b0.b, b0.g, b0.r)))
  }

  test("recognized-but-corrupt media yields null rows, not task failures") {
    // valid PNG signature + header, truncated pixel stream: ImageIO finds
    // a reader and read() THROWS — decode must swallow to None
    val good = png(16, 16)((x, y) => x * 65536 + y)
    val truncated = good.take(40)
    assert(ImageIo.decode(truncated) === None)
    assert(ImageIo.meta(truncated).isDefined, "header itself parses")
    // garbage after a real header: every prefix must be crash-free
    (8 until good.length by 17).foreach { cut =>
      ImageIo.decode(good.take(cut)) // must not throw
    }
    val df = Seq((1L, good), (2L, truncated)).toDF("id", "blob")
    val rows = ImageIo.imageStats(df, "id", "blob").orderBy("id").collect()
    assert(!rows(0).isNullAt(4))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(4),
      "corrupt blob must produce a null row")
  }
}
