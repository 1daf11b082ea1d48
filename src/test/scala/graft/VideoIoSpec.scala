package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{PlantedImages, PlantedVideos, VideoIo}

/** Real video demux path: the RIFF/AVI chunk walker + per-frame PNG
  * decode behind the Multimodal batch contract.
  */
class VideoIoSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("planted AVIs demux to planted frames; frames decode to planted colors") {
    PlantedVideos.all.filter(_.kind == "avi").foreach { p =>
      val Some((meta, frames)) = VideoIo.demux(p.blob)
      assert(meta.width === p.w && meta.height === p.h)
      assert(meta.totalFrames === PlantedVideos.framesPerVideo)
      assert(frames.length === PlantedVideos.framesPerVideo)
      frames.zip(p.colors).foreach { case (fb, (r, g, b)) =>
        val img = graft.multimodal.ImageIo.decode(fb).get
        assert(img.getWidth === p.w && img.getHeight === p.h)
        assert((img.getRGB(0, 0) & 0xffffff) === ((r << 16) | (g << 8) | b))
      }
    }
  }

  test("walker follows chunk sizes, not fixed offsets; odd payloads are even-padded") {
    // a foreign chunk between hdrl and movi must be skipped transparently
    val p = PlantedVideos.all.head
    val Some((_, want)) = VideoIo.demux(p.blob)
    val riffBody = java.util.Arrays.copyOfRange(p.blob, 8, p.blob.length)
    val junk = {
      val payload = Array.tabulate(7)(_.toByte) // odd size -> pad byte required
      val bb = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("JUNK".getBytes("US-ASCII")).putInt(7).put(payload).put(0.toByte)
      bb.array()
    }
    // splice: RIFF hdr | 'AVI ' | hdrl | JUNK | movi  (hdrl ends where movi starts)
    val hdrlEnd = {
      val hdrlSize = (p.blob(16) & 0xff) | ((p.blob(17) & 0xff) << 8) |
        ((p.blob(18) & 0xff) << 16) | ((p.blob(19) & 0xff) << 24)
      20 + hdrlSize
    }
    val spliced = p.blob.slice(8, hdrlEnd) ++ junk ++ p.blob.drop(hdrlEnd)
    val out = java.nio.ByteBuffer.allocate(8 + spliced.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(spliced.length).put(spliced)
    val Some((meta2, got)) = VideoIo.demux(out.array())
    assert(meta2.totalFrames === PlantedVideos.framesPerVideo)
    assert(got.length === want.length)
    assert(got.zip(want).forall { case (a, b) => java.util.Arrays.equals(a, b) })
  }

  test("odd-size frame payloads round-trip through the writer's pad byte") {
    val odd = Array.tabulate(33)(j => (j * 7).toByte) // not a PNG, odd length
    val even = Array.tabulate(20)(j => (j * 3).toByte)
    val blob = PlantedVideos.aviBytes(2, 2, Seq(odd, even, odd))
    val Some((meta, frames)) = VideoIo.demux(blob)
    assert(meta.totalFrames === 3 && frames.length === 3)
    assert(java.util.Arrays.equals(frames(0), odd))
    assert(java.util.Arrays.equals(frames(1), even))
    assert(java.util.Arrays.equals(frames(2), odd))
  }

  test("frames inside LIST('rec ') grouping sub-lists are demuxed") {
    // the AVI interleave convention: wrap each frame chunk in its own
    // LIST('rec '); a size-following walker must find them all
    val p = PlantedVideos.all.head
    val Some((_, want)) = VideoIo.demux(p.blob)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      if (pad == 1) bb.put(0.toByte)
      bb.array()
    }
    val recs = want.flatMap(f =>
      chunk("LIST", "rec ".getBytes("US-ASCII") ++ chunk("00dc", f))).toArray
    val hdrlEnd = {
      val hs = (p.blob(16) & 0xff) | ((p.blob(17) & 0xff) << 8) |
        ((p.blob(18) & 0xff) << 16) | ((p.blob(19) & 0xff) << 24)
      20 + hs
    }
    val body = p.blob.slice(8, hdrlEnd) ++
      chunk("LIST", "movi".getBytes("US-ASCII") ++ recs)
    val out = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    val Some((_, got)) = VideoIo.demux(out.array())
    assert(got.length === want.length)
    assert(got.zip(want).forall { case (a, b) => java.util.Arrays.equals(a, b) })
  }

  test("zero-frame but decodable AVI keeps its id: one row with the header count") {
    val blob = PlantedVideos.aviBytes(3, 3, Seq.empty)
    val Some((meta, frames)) = VideoIo.demux(blob)
    assert(meta.totalFrames === 0 && frames.isEmpty)
    val df = Seq((7L, blob)).toDF("id", "blob")
    val rows = VideoIo.videoFrameStats(df, "id", "blob").collect()
    assert(rows.length === 1)
    assert(rows(0).getLong(0) === 7L && rows(0).isNullAt(1))
    assert(rows(0).getLong(5) === 0L, "header frame count must survive")
  }

  test("malformed containers -> None; truncation never throws") {
    assert(VideoIo.demux(null).isEmpty)
    assert(VideoIo.demux(Array.empty[Byte]).isEmpty)
    assert(VideoIo.demux("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    val good = PlantedVideos.all.head.blob
    (1 until good.length by 13).foreach { cut =>
      VideoIo.demux(good.take(cut)) // must not throw; None or partial-but-valid
    }
  }

  test("batch path: per-frame rows, all-null row for undecodables, repartition-stable") {
    val df = PlantedVideos.all.map(p => (p.id, p.blob)).toDF("id", "blob")
    val a = VideoIo.videoFrameStats(df, "id", "blob").orderBy("id", "frame_idx").collect().toSeq
    val b = VideoIo.videoFrameStats(df.repartition(4), "id", "blob")
      .orderBy("id", "frame_idx").collect().toSeq
    assert(a === b)
    val bad = a.filter(_.getLong(0) >= 200L)
    assert(bad.length === 2 && bad.forall(r => r.isNullAt(1) && r.isNullAt(4)))
    val avi = a.filter(_.getLong(0) < 200L)
    assert(avi.length === 5 * PlantedVideos.framesPerVideo)
    assert(avi.forall(_.getLong(5) === PlantedVideos.framesPerVideo.toLong))
  }
}
