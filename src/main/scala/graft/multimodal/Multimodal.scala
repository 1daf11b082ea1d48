package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * travel as opaque `binary` columns next to typed metadata; decode /
  * feature-extraction runs batch-wise over partitions.
  *
  * The codec is PLUGGABLE: the default is a deterministic fake
  * (`fakeDecode`/`fakeResize`) so the Spark-side contract (schema,
  * partitioning, batch shape, null handling) stays oracle-checkable;
  * [[ImageIo]] provides a REAL pure-JVM image codec (javax.imageio —
  * PNG/BMP/GIF/JPEG/TIFF, headless, no native libs) and [[AudioIo]] a
  * REAL pure-JVM audio codec (javax.sound.sampled — WAV/AU/AIFF) behind
  * the same batch APIs, and [[VideoIo]] a REAL RIFF/AVI demuxer (own
  * chunk walker from the published layout; Motion-PNG frames decode via
  * [[ImageIo]]) — all three oracle-checked on planted fixtures
  * (q113/q114/q115). Only compressed video *codecs* (H.264 etc.) are
  * absent from the JDK; `sampleFrames`' fake remains the pluggable
  * default for those, and a production deployment plugs a JNI/library
  * call in without touching any plan shape.
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

  /** STUB decode: where a real pipeline would run the image/audio codec.
    * Deterministic: derives a fixed-length feature vector from one md5 of
    * the blob — feature j is the low 9 bits of `md5₆₄(blob) xor c_j`
    * scaled by 1/256 (a dyadic rational, so the float value is exact and
    * a DuckDB oracle reproduces it bit-for-bit; see q47). Replace with
    * the real codec (e.g. via JNI) in production — signature and batch
    * shape are the contract.
    */
  def fakeDecode(blob: Array[Byte], featureDim: Int): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below keeps the
    // distributed plumbing testable (and oracle-checkable) in this
    // container.
    val d = java.security.MessageDigest.getInstance("MD5").digest(blob)
    val h = java.nio.ByteBuffer.wrap(d, 0, 8).getLong
    Array.tabulate(featureDim) { j =>
      ((h ^ mmConst(j)) & 511L).toFloat / 256.0f
    }
  }

  /** STUB resize: a real pipeline decodes, resamples to (w, h), and
    * re-encodes; the deterministic fake folds the blob into a w*h-byte
    * "thumbnail" so size/idempotence contracts are testable. Runs in the
    * same per-partition batch shape as [[extractFeatures]].
    */
  def fakeResize(blob: Array[Byte], w: Int, h: Int): Array[Byte] = {
    // ??? <- real image codec goes here
    val out = new Array[Byte](w * h)
    var i = 0
    while (i < blob.length) {
      out(i % out.length) = (out(i % out.length) ^ blob(i)).toByte
      i += 1
    }
    out
  }

  /** STUB frame sampling: a real pipeline decodes a video container and
    * keeps every `stride`-th frame; the fake treats the blob as fixed
    * `frameSize`-byte frames. Output rows: (id, frame_idx, frame blob) —
    * one input row explodes to its sampled frames, metadata stays
    * columnar.
    */
  def sampleFrames(df: DataFrame, idCol: String, blobCol: String,
                   frameSize: Int, stride: Int): DataFrame = {
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
        val nFrames = blob.length / frameSize
        // ??? <- real demux/decoder goes here
        (0 until nFrames by stride).map { f =>
          Row(id, f, java.util.Arrays.copyOfRange(blob, f * frameSize, (f + 1) * frameSize))
        }
      }
    }(encoder)
  }

  /** Resize over partitions (same batch contract as [[extractFeatures]]).
    * `resample` is the pluggable codec — the deterministic fake by
    * default (oracle-checkable, q91), [[ImageIo.resize]] for real image
    * blobs; a null result marks an undecodable blob.
    */
  def resizeBlobs(df: DataFrame, idCol: String, blobCol: String,
                  w: Int, h: Int,
                  resample: (Array[Byte], Int, Int) => Array[Byte] = fakeResize): DataFrame = {
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
    * `decode` is the pluggable codec — the deterministic fake by default
    * (oracle-checkable, q47), [[ImageIo.features]] for real image blobs;
    * a null result marks an undecodable blob.
    */
  def extractFeatures(df: DataFrame, idCol: String, blobCol: String,
                      featureDim: Int = 16,
                      decode: (Array[Byte], Int) => Array[Float] = fakeDecode): DataFrame = {
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
