package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * travel as opaque `binary` columns next to typed metadata; decode /
  * feature-extraction runs batch-wise over partitions.
  *
  * The codec is PLUGGABLE, and the REAL codecs are the defaults:
  * [[ImageIo]] (javax.imageio — PNG/BMP/GIF/JPEG/TIFF, headless, no
  * native libs) backs `extractFeatures`/`resizeBlobs`, [[VideoIo]] (a
  * RIFF/AVI chunk walker from the published layout; Motion-PNG frames
  * decode via [[ImageIo]]) backs `sampleFrames`, and [[AudioIo]]
  * (javax.sound.sampled — WAV/AU/AIFF) the audio stats — all three
  * oracle-checked on planted fixtures (q113/q114/q115). The
  * deterministic fakes (`fakeDecode`/`fakeResize`/`fixedFrames`) remain
  * as explicitly named CONTRACT-CHECKERS: SQL-replayable codecs whose
  * md5/XOR/slice math a DuckDB oracle reproduces bit-for-bit, so the
  * distributed plumbing (schema, partitioning, batch shape, null
  * handling) hash-checks independently of any real media bytes
  * (q47/q90/q91 pass them explicitly). Only compressed video *codecs*
  * (H.264 etc.) are absent from the JDK; a production deployment plugs
  * a JNI/library call into the same slots without touching any plan
  * shape.
  *
  * Scale notes: blobs never enter a shuffle key; feature extraction is
  * `mapPartitions` (one codec init per partition, not per row); metadata
  * columns are plain columns so filters on them prune parquet row groups
  * before any blob is materialized.
  */
object Multimodal {

  /** Typed metadata the stub "decoder" emits per media blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Attach a binary media column derived from a string column (testdata
    * has no real media; UTF-8 bytes of text stand in as the opaque blob).
    */
  def withBlob(df: DataFrame, srcCol: String, blobCol: String): DataFrame =
    df.withColumn(blobCol, encode(col(srcCol), "UTF-8"))

  /** Header-sniff metadata as pure column arithmetic over the blob —
    * deterministic fake of an image header parse. Kept SQL-expressible so
    * the driver oracle can check the plumbing end to end.
    */
  def stubMeta(df: DataFrame, blobCol: String): DataFrame = {
    val len = octet_length(col(blobCol)).cast("long")
    // floor-division keeps everything integral: Spark's `/` on longs is
    // double division, whose int cast truncates while other engines round.
    df.withColumn("width", (lit(16) + pmod(len, lit(64))).cast("int"))
      .withColumn("height", (lit(16) + pmod(floor(len / lit(64)).cast("long"), lit(64))).cast("int"))
      .withColumn("n_frames", (lit(1) + pmod(len, lit(8))).cast("int"))
      .withColumn("format",
        when(pmod(len, lit(3)) === 0, "png")
          .when(pmod(len, lit(3)) === 1, "jpeg")
          .otherwise("webp"))
  }

  /** Per-index constants for [[fakeDecode]]'s hash family (one md5 of the
    * blob, xor'd with an md5-derived constant per feature index — the same
    * cross-engine family the MinHash oracle uses).
    */
  private val mmConsts = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
  private def mmConst(j: Int): Long =
    mmConsts.computeIfAbsent(j,
      k => graft.dedup.Dedup.md5Const64(s"graft-mm#$k")).longValue

  /** Contract-checker decode (the real default is [[ImageIo.features]]).
    * Deterministic and SQL-replayable: derives a fixed-length feature
    * vector from one md5 of the blob — feature j is the low 9 bits of
    * `md5₆₄(blob) xor c_j` scaled by 1/256 (a dyadic rational, so the
    * float value is exact and a DuckDB oracle reproduces it bit-for-bit;
    * q47 passes it explicitly), letting the mapPartitions plumbing
    * hash-check on arbitrary bytes where a real codec would return null.
    */
  def fakeDecode(blob: Array[Byte], featureDim: Int): Array[Float] = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(blob)
    val h = java.nio.ByteBuffer.wrap(d, 0, 8).getLong
    Array.tabulate(featureDim) { j =>
      ((h ^ mmConst(j)) & 511L).toFloat / 256.0f
    }
  }

  /** Contract-checker resize (the real default is [[ImageIo.resize]]:
    * decode, nearest-neighbor resample to (w, h), PNG re-encode). The
    * deterministic fake folds the blob into a w*h-byte "thumbnail" by
    * XOR at i % (w*h) — order-independent, so a DuckDB oracle replays it
    * as a bit_xor group-by (q91 passes it explicitly) and the
    * size/idempotence contracts stay testable on arbitrary bytes.
    */
  def fakeResize(blob: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    var i = 0
    while (i < blob.length) {
      out(i % out.length) = (out(i % out.length) ^ blob(i)).toByte
      i += 1
    }
    out
  }

  /** The real default demux for [[sampleFrames]]: [[VideoIo.demux]]'s
    * RIFF/AVI chunk walk — an undecodable blob yields zero frames (the
    * null-row contract of the other batch APIs, specialized to explode
    * shape: no rows rather than a null cell).
    */
  def aviFrames(blob: Array[Byte]): IndexedSeq[Array[Byte]] =
    VideoIo.demux(blob).map(_._2).getOrElse(Vector.empty)

  /** Contract-checker demux: treats the blob as consecutive
    * `frameSize`-byte frames — SQL-replayable byte slicing (q90 passes
    * it explicitly), so the explode plumbing hash-checks on arbitrary
    * bytes.
    */
  def fixedFrames(frameSize: Int)(blob: Array[Byte]): IndexedSeq[Array[Byte]] =
    (0 until blob.length / frameSize).map(f =>
      java.util.Arrays.copyOfRange(blob, f * frameSize, (f + 1) * frameSize))

  /** Frame sampling: demux each blob and keep every `stride`-th frame.
    * `demux` is the pluggable codec — [[aviFrames]] (the real RIFF/AVI
    * walker) by default, [[fixedFrames]] as the oracle-checkable
    * contract-checker. Output rows: (id, frame_idx, frame blob) — one
    * input row explodes to its sampled frames (frame_idx is the index
    * in the ORIGINAL frame sequence), metadata stays columnar.
    */
  def sampleFrames(df: DataFrame, idCol: String, blobCol: String,
                   stride: Int,
                   demux: Array[Byte] => IndexedSeq[Array[Byte]] = aviFrames): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    df.select(col(idCol).cast("long"), col(blobCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val blob = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val frames = demux(blob)
        (0 until frames.length by stride).map(f => Row(id, f, frames(f)))
      }
    }(encoder)
  }

  /** Resize over partitions (same batch contract as [[extractFeatures]]).
    * `resample` is the pluggable codec — [[ImageIo.resize]] (real) by
    * default, [[fakeResize]] as the oracle-checkable contract-checker
    * (q91); a null result marks an undecodable blob.
    */
  def resizeBlobs(df: DataFrame, idCol: String, blobCol: String,
                  w: Int, h: Int,
                  resample: (Array[Byte], Int, Int) => Array[Byte] = ImageIo.resize): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("resized", BinaryType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    df.select(col(idCol).cast("long"), col(blobCol)).mapPartitions { rows =>
      rows.map { r =>
        val blob = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        Row(r.getLong(0), resample(blob, w, h))
      }
    }(encoder)
  }

  /** Batch feature extraction over partitions: one codec per partition,
    * rows streamed through it. Output: (idCol, features array<float>).
    * `decode` is the pluggable codec — [[ImageIo.features]] (real) by
    * default, [[fakeDecode]] as the oracle-checkable contract-checker
    * (q47); a null result marks an undecodable blob.
    */
  def extractFeatures(df: DataFrame, idCol: String, blobCol: String,
                      featureDim: Int = 16,
                      decode: (Array[Byte], Int) => Array[Float] = ImageIo.features): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val encoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    val input = df.select(col(idCol).cast("long"), col(blobCol))
    input.mapPartitions { rows =>
      // per-partition init site (a stateful codec would open its context here)
      rows.map { r =>
        val id = r.getLong(0)
        val blob = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val f = decode(blob, featureDim)
        Row(id, if (f == null) null else f.toSeq)
      }
    }(encoder)
  }
}
