package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * travel as opaque `binary` columns next to typed metadata; decode /
  * feature-extraction runs batch-wise over partitions.
  *
  * The actual codec step is STUBBED — image/audio libraries are not in
  * this container — with a deterministic fake (`fakeDecode`) so the
  * Spark-side contract (schema, partitioning, batch shape, null handling)
  * is real and tested. A production deployment swaps `fakeDecode` for a
  * JNI/library call without touching any plan shape.
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

  /** STUB decode: where a real pipeline would run the image/audio codec.
    * Deterministic: derives a fixed-length feature vector from blob bytes.
    * Replace with the real codec (e.g. via JNI) in production — signature
    * and batch shape are the contract.
    */
  def fakeDecode(blob: Array[Byte], featureDim: Int): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below keeps the
    // distributed plumbing testable in this container.
    val out = new Array[Float](featureDim)
    var h = 1125899906842597L // FNV-ish rolling state
    var i = 0
    while (i < blob.length) {
      h = h * 31 + (blob(i) & 0xFF)
      out(math.abs((h % featureDim).toInt)) += ((blob(i) & 0xFF) / 255.0f)
      i += 1
    }
    var j = 0
    while (j < featureDim) { out(j) = out(j) / math.max(1, blob.length); j += 1 }
    out
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

  /** Resize over partitions (same batch contract as [[extractFeatures]]). */
  def resizeBlobs(df: DataFrame, idCol: String, blobCol: String,
                  w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("resized", BinaryType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    df.select(col(idCol).cast("long"), col(blobCol)).mapPartitions { rows =>
      rows.map { r =>
        val blob = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        Row(r.getLong(0), fakeResize(blob, w, h))
      }
    }(encoder)
  }

  /** Batch feature extraction over partitions: one "codec" per partition,
    * rows streamed through it. Output: (idCol, features array<float>).
    */
  def extractFeatures(df: DataFrame, idCol: String, blobCol: String,
                      featureDim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val encoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    val input = df.select(col(idCol).cast("long"), col(blobCol))
    input.mapPartitions { rows =>
      // per-partition init site (real codec would open its context here)
      rows.map { r =>
        val id = r.getLong(0)
        val blob = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        Row(id, fakeDecode(blob, featureDim).toSeq)
      }
    }(encoder)
  }
}
