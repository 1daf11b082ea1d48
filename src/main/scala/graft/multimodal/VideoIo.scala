package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL video demux behind [[Multimodal]]'s batch contract: a RIFF/AVI
  * container walker written from the published AVI layout (RIFF('AVI ')
  * → LIST('hdrl') with the 56-byte 'avih' main header → LIST('movi')
  * with '##dc'/'##db' frame chunks, all chunks even-padded). The JDK has
  * no video *codec*, but container demux needs none — and with PNG
  * frame payloads (the real "Motion PNG" arrangement, fourcc MPNG) the
  * per-frame decode is [[ImageIo]]'s deterministic PNG path, so the
  * whole demux→decode pipeline runs on real parsers end to end
  * (oracle-checked in q115 the same way as q113/q114: the DuckDB oracle
  * re-walks the chunk chain by offset arithmetic over the blob hex).
  *
  * The walker is generic — it follows chunk sizes, never fixed offsets —
  * and returns None for malformed/truncated containers (skip-don't-crash
  * for corrupt corpus media).
  */
object VideoIo {

  final case class AviMeta(width: Int, height: Int, totalFrames: Int)

  private def fourcc(b: Array[Byte], off: Int): String =
    if (off + 4 > b.length) "" else new String(b, off, 4, "US-ASCII")

  private def le32(b: Array[Byte], off: Int): Int =
    if (off + 4 > b.length) -1
    else (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Walk the container: Some((main header meta, frame payloads)) or None
    * if the blob is not a well-formed AVI.
    */
  def demux(blob: Array[Byte]): Option[(AviMeta, Vector[Array[Byte]])] = {
    if (blob == null || blob.length < 24) return None
    if (fourcc(blob, 0) != "RIFF" || fourcc(blob, 8) != "AVI ") return None
    val riffEnd = math.min(blob.length.toLong, 8L + le32(blob, 4))
    var meta: Option[AviMeta] = None
    val frames = Vector.newBuilder[Array[Byte]]
    var pos = 12L
    while (pos + 8 <= riffEnd) {
      val id = fourcc(blob, pos.toInt)
      val size = le32(blob, pos.toInt + 4).toLong
      if (size < 0 || pos + 8 + size > riffEnd) return None
      if (id == "LIST") {
        val listType = fourcc(blob, pos.toInt + 8)
        // returns false on malformed nesting (bad size) → whole blob None
        def walk(from: Long, until: Long, inMovi: Boolean): Boolean = {
          var p = from
          while (p + 8 <= until) {
            val cid = fourcc(blob, p.toInt)
            val csz = le32(blob, p.toInt + 4).toLong
            if (csz < 0 || p + 8 + csz > until) return false
            if (listType == "hdrl" && cid == "avih" && csz >= 40) {
              val o = p.toInt + 8
              meta = Some(AviMeta(le32(blob, o + 32), le32(blob, o + 36), le32(blob, o + 16)))
            } else if (inMovi && cid == "LIST" &&
                fourcc(blob, p.toInt + 8) == "rec ") {
              // the spec's interleave convention groups frame chunks in
              // LIST('rec ') sub-lists — recurse one level into them
              if (!walk(p + 12, p + 8 + csz, inMovi = true)) return false
            } else if (inMovi && cid.length == 4 &&
                cid(0).isDigit && cid(1).isDigit &&
                (cid.substring(2) == "dc" || cid.substring(2) == "db")) {
              frames += java.util.Arrays.copyOfRange(blob, p.toInt + 8, (p + 8 + csz).toInt)
            }
            p += 8 + csz + (csz & 1)  // chunks are even-padded
          }
          true
        }
        if (!walk(pos + 12, pos + 8 + size, inMovi = listType == "movi")) return None
      }
      pos += 8 + size + (size & 1)
    }
    meta.map(m => (m, frames.result()))
  }

  /** Demux + per-frame decode in the [[Multimodal]] batch shape: one row
    * per frame — (id, frame_idx, width, height, rgb_sum, n_frames) with
    * frame dims and the exact integer pixel sum from the real PNG decode
    * and n_frames from the container's main header. Ids never vanish: a
    * decodable container with zero frames emits one row with null frame
    * fields and its header count; an undecodable blob emits a single
    * all-NULL row.
    */
  def videoFrameStats(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("rgb_sum", LongType),
      StructField("n_frames", LongType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    df.select(col(idCol).cast("long"), col(blobCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val blob = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        demux(blob) match {
          case Some((meta, frames)) if frames.nonEmpty =>
            frames.iterator.zipWithIndex.map { case (fb, i) =>
              ImageIo.decode(fb) match {
                case Some(img) =>
                  Row(id, i, img.getWidth, img.getHeight, ImageIo.rgbSum(img),
                    meta.totalFrames.toLong)
                case None => Row(id, i, null, null, null, meta.totalFrames.toLong)
              }
            }
          case Some((meta, _)) =>
            // decodable container, zero frames: the id must not vanish —
            // one row carrying the (zero) header frame count
            Iterator.single(Row(id, null, null, null, null, meta.totalFrames.toLong))
          case None => Iterator.single(Row(id, null, null, null, null, null))
        }
      }
    }(encoder)
  }
}

/** Planted AVI fixtures for the demux+decode oracle check (q115): the
  * writer emits the standard chunk chain (hdrl: avih + one 'vids' strl
  * with an MPNG BITMAPINFOHEADER; movi: '00dc' PNG frames, even-padded)
  * with all sizes computed, not assumed. Every fixture has exactly
  * [[PlantedVideos.framesPerVideo]] frames so the oracle can chain frame
  * offsets through lateral aliases; frame colors/dims are fixed
  * arithmetic in (video index, frame index).
  */
object PlantedVideos {

  val framesPerVideo = 4

  final case class Planted(id: Long, kind: String, w: Int, h: Int,
                           colors: Seq[(Int, Int, Int)], blob: Array[Byte])

  /** (r, g, b) of frame f in video i — replayed by the oracle literals. */
  def colorAt(i: Int, f: Int): (Int, Int, Int) =
    ((i * 53 + f * 19 + 13) % 256, (i * 71 + f * 37 + 5) % 256, (i * 31 + f * 89 + 47) % 256)

  private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val pad = payload.length & 1
    val out = ByteBuffer.allocate(8 + payload.length + pad).order(ByteOrder.LITTLE_ENDIAN)
    out.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
    if (pad == 1) out.put(0.toByte)
    out.array()
  }

  private def list(tpe: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", tpe.getBytes("US-ASCII") ++ payload)

  def aviBytes(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(40000).putInt(0).putInt(0).putInt(0)   // usec/frame, maxbytes, padding, flags
      .putInt(frames.length).putInt(0).putInt(1).putInt(0)  // totalFrames, initial, streams, suggbuf
      .putInt(w).putInt(h)                              // dwWidth, dwHeight (+16 reserved)
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("US-ASCII")).put("MPNG".getBytes("US-ASCII"))
      .putInt(0).putShort(0).putShort(0).putInt(0)     // flags, prio, lang, initial
      .putInt(1).putInt(25).putInt(0).putInt(frames.length)  // scale, rate, start, length
      .putInt(0).putInt(-1).putInt(0)                  // suggbuf, quality, samplesize
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)  // rcFrame
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .put("MPNG".getBytes("US-ASCII")).putInt(w * h * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    val hdrl = list("hdrl", chunk("avih", avih.array()) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    out.array()
  }

  val all: Seq[Planted] = {
    val avis = (0 until 5).map { i =>
      val w = 4 + i % 5; val h = 3 + i % 4
      val colors = (0 until framesPerVideo).map(f => colorAt(i, f))
      val frames = colors.map { case (r, g, b) => PlantedImages.pngBytes(w, h, r, g, b) }
      Planted(i.toLong, "avi", w, h, colors, aviBytes(w, h, frames))
    }
    val bad = Seq(
      Planted(200L, "bad", 0, 0, Nil,
        Array.tabulate(40)(j => ((j * 173 + 31) % 256).toByte)),
      Planted(201L, "bad", 0, 0, Nil, Array.empty[Byte]))
    avis ++ bad
  }

  /** `(id, kind, hex(blob), r+g+b of each frame)` VALUES rows. */
  def sqlValues: String =
    all.map { p =>
      val sums = (0 until framesPerVideo)
        .map(f => p.colors.lift(f).map { case (r, g, b) => r + g + b }.getOrElse(0))
      s"(${p.id}, '${p.kind}', '${PlantedImages.hex(p.blob)}', ${sums.mkString(", ")})"
    }.mkString(",\n    ")
}
