package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{ImageIo, Multimodal, VideoIo}

/** The unified codec slots (VERDICT r11 item 6): the REAL codecs are the
  * named defaults of the Multimodal batch APIs, the fakes are explicitly
  * named contract-checkers. This spec pins fake-vs-real parity of the
  * PLUMBING on planted fixtures — each default path through the batch
  * API must equal the direct real-codec call on the same bytes, and the
  * contract-checkers must keep their documented SQL-replayable shapes.
  */
class MultimodalDefaultsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("extractFeatures DEFAULT is the real ImageIo.features; fake stays the checker") {
    val blobs = Seq(
      (1L, png(8, 8)((x, y) => (x * 32 << 16) | (y * 32 << 8))),
      (2L, png(4, 4)((x, _) => if (x < 2) 0 else 0xffffff)),
      (3L, "not an image".getBytes("UTF-8")))
    val df = blobs.toDF("id", "blob")
    val got = Multimodal.extractFeatures(df, "id", "blob", featureDim = 4)
      .orderBy("id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Float](1).toSeq)).toMap
    val want = blobs.map { case (id, b) =>
      id -> Option(ImageIo.features(b, 4)).map(_.toSeq).orNull
    }.toMap
    assert(got === want)
    assert(got(3L) === null, "real default must null undecodable blobs")
    // the contract-checker still decodes ANY bytes deterministically
    val fake = Multimodal.fakeDecode("not an image".getBytes("UTF-8"), 4)
    assert(fake.length === 4 && fake.forall(f => f >= 0.0f && f < 2.0f))
  }

  test("resizeBlobs DEFAULT is the real ImageIo.resize; fake stays the checker") {
    val src = png(4, 4)((x, _) => if (x < 2) 0xff0000 else 0x0000ff)
    val df = Seq((1L, src), (2L, "junk".getBytes("UTF-8"))).toDF("id", "blob")
    val got = Multimodal.resizeBlobs(df, "id", "blob", 2, 2)
      .orderBy("id").collect()
    assert(java.util.Arrays.equals(got(0).getAs[Array[Byte]](1),
      ImageIo.resize(src, 2, 2)))
    assert(got(1).isNullAt(1), "real default must null undecodable blobs")
    // the fake keeps its w*h fold shape on the same junk bytes
    assert(Multimodal.fakeResize("junk".getBytes("UTF-8"), 2, 2).length === 4)
  }

  test("sampleFrames DEFAULT is the real AVI demux; fixedFrames stays the checker") {
    val frames = (0 until 5).map(i => png(2, 2)((_, _) => i * 0x111111))
    val avi = graft.multimodal.PlantedVideos.aviBytes(2, 2, frames)
    val df = Seq((1L, avi), (2L, "not avi".getBytes("UTF-8"))).toDF("id", "blob")
    val got = Multimodal.sampleFrames(df, "id", "blob", stride = 2)
      .orderBy("id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq))
    // every 2nd ORIGINAL frame of the demuxed AVI, nothing for garbage
    val Some((_, demuxed)) = VideoIo.demux(avi)
    val want = Seq(0, 2, 4).map(i => (1L, i, demuxed(i).toSeq))
    assert(got.toSeq === want)
    // the checker slices the same garbage bytes into fixed frames
    assert(Multimodal.fixedFrames(3)("not avi".getBytes("UTF-8")).length === 2)
  }
}
