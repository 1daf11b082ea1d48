package graft.multimodal

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}
import javax.sound.sampled.{AudioFormat, AudioSystem}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL audio codec behind [[Multimodal]]'s batch contract — pure-JVM
  * `javax.sound.sampled` (WAV / AU / AIFF parsers ship with the JDK; no
  * native libraries, fully headless — decoding never touches an audio
  * device). This closes the audio half of the "codec is a deterministic
  * fake" gap the same way [[ImageIo]] closed the image half; video has
  * no JDK codec and stays behind the pluggable fake.
  *
  * Determinism: header metadata comes from the container parser; the
  * pixel-sum analogue is `pcm_sum`, the exact integer sum of decoded
  * PCM samples — no float anywhere, so a byte-offset oracle over the
  * same blob reproduces it bit-for-bit (q114). Undecodable blobs yield
  * all-NULL rows (skip-don't-crash, as for corrupt corpus media).
  */
object AudioIo {

  /** Decoded stats: (container type lowercased, channels, sampleRate,
    * bitsPerSample, frameCount, exact signed sample sum). None for
    * null/empty/undecodable blobs or non-integer PCM encodings.
    */
  def stats(blob: Array[Byte]): Option[(String, Int, Int, Int, Long, Long)] = {
    if (blob == null || blob.length == 0) return None
    try {
      val tpe = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(blob))
        .getType.toString.toLowerCase(java.util.Locale.ROOT)
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(blob))
      try {
        val f = ais.getFormat
        val signed = f.getEncoding == AudioFormat.Encoding.PCM_SIGNED
        val unsigned = f.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
        if (!signed && !unsigned) return None
        val bits = f.getSampleSizeInBits
        if (bits != 8 && bits != 16) return None
        val pcm = ais.readAllBytes()
        val bb = ByteBuffer.wrap(pcm).order(
          if (f.isBigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
        var sum = 0L
        if (bits == 16) while (bb.remaining >= 2) {
          val v = bb.getShort.toLong
          sum += (if (signed) v else v & 0xffffL)
        } else while (bb.hasRemaining) {
          val v = bb.get.toLong
          sum += (if (signed) v else v & 0xffL)
        }
        Some((tpe, f.getChannels, f.getSampleRate.toInt, bits, ais.getFrameLength, sum))
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException                               => None
    }
  }

  /** Real full-decode audio stats in the [[Multimodal]] batch shape:
    * (id, format, channels, sample_rate, bits, n_frames, pcm_sum) —
    * exact integers only, nulls for undecodable blobs. One parser init
    * per partition via `mapPartitions`.
    */
  def audioStats(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("format", StringType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_frames", LongType),
      StructField("pcm_sum", LongType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    df.select(col(idCol).cast("long"), col(blobCol)).mapPartitions { rows =>
      rows.map { r =>
        val blob = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        stats(blob) match {
          case Some((tpe, ch, rate, bits, frames, sum)) =>
            Row(r.getLong(0), tpe, ch, rate, bits, frames, sum)
          case None => Row(r.getLong(0), null, null, null, null, null, null)
        }
      }
    }(encoder)
  }
}

/** Planted audio fixtures for the real-codec oracle check (q114) — the
  * audio twin of [[PlantedImages]]. Both containers are hand-written
  * byte-by-byte from their published layouts (no `javax.sound` on the
  * encode side), so the JDK parser is checked against an independent
  * spec-derived construction AND the DuckDB oracle re-parses identical
  * bytes with offset arithmetic:
  *  - WAV (RIFF, little-endian): channels @22, sample rate @24, bits
  *    @34, data size @40, 16-bit signed LE samples from @44;
  *  - AU (big-endian): data offset @4 (=24), data size @8, encoding
  *    @12 (=3, 16-bit linear PCM), sample rate @16, channels @20,
  *    16-bit signed BE samples from @24.
  * Sample values are fixed arithmetic in (fixture index, sample index).
  */
object PlantedAudio {

  final case class Planted(id: Long, kind: String, channels: Int, rate: Int,
                           frames: Int, blob: Array[Byte])

  def wavBytes(ch: Int, rate: Int, frames: Int, sample: Int => Int): Array[Byte] = {
    val n = frames * ch
    val dataSize = n * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(ch.toShort)
    buf.putInt(rate).putInt(rate * ch * 2).putShort((ch * 2).toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var k = 0
    while (k < n) { buf.putShort(sample(k).toShort); k += 1 }
    buf.array()
  }

  def auBytes(ch: Int, rate: Int, frames: Int, sample: Int => Int): Array[Byte] = {
    val n = frames * ch
    val dataSize = n * 2
    val buf = ByteBuffer.allocate(24 + dataSize).order(ByteOrder.BIG_ENDIAN)
    buf.put(".snd".getBytes("US-ASCII")).putInt(24).putInt(dataSize).putInt(3)
    buf.putInt(rate).putInt(ch)
    var k = 0
    while (k < n) { buf.putShort(sample(k).toShort); k += 1 }
    buf.array()
  }

  /** Deterministic signed 16-bit sample: spans both signs, exercises the
    * sign-extension path in both parsers.
    */
  def sampleAt(i: Int, k: Int): Int = ((k * 2957 + i * 1031) % 60000) - 30000

  val all: Seq[Planted] = {
    val wavs = (0 until 6).map { i =>
      val ch = 1 + i % 2; val rate = 8000 * (1 + i % 3); val frames = 20 + i * 5
      Planted(i.toLong, "wav", ch, rate, frames,
        wavBytes(ch, rate, frames, sampleAt(i, _)))
    }
    val aus = (0 until 4).map { i =>
      val ch = 1 + i % 2; val rate = 11025 * (1 + i % 2); val frames = 16 + i * 7
      Planted(100L + i, "au", ch, rate, frames,
        auBytes(ch, rate, frames, sampleAt(10 + i, _)))
    }
    val bad = Seq(
      Planted(200L, "bad", 0, 0, 0,
        Array.tabulate(48)(j => ((j * 151 + 29) % 256).toByte)),
      Planted(201L, "bad", 0, 0, 0, Array.empty[Byte]))
    wavs ++ aus ++ bad
  }

  /** `(id, kind, hex(blob))` VALUES rows for the oracle. */
  def sqlValues: String =
    all.map(p => s"(${p.id}, '${p.kind}', '${PlantedImages.hex(p.blob)}')")
      .mkString(",\n    ")
}
