package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.{Packing, TextOps}

/** Sequence-packing invariants and the sharded-sink composition. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def pack(df: org.apache.spark.sql.DataFrame, maxLen: Int, buckets: Int) =
    Packing.packSequences(df, "doc_id", "n_toks", maxLen, buckets)

  test("capacity, truncation, and zero-token docs") {
    val docs = Seq(
      (0L, 300L), (8L, 300L), (16L, 100L), // bucket 0: 300+300 > 512 -> split
      (1L, 9999L),                         // bucket 1: oversize, truncated to 512
      (2L, 0L), (10L, 0L)                  // bucket 2: zero-token docs share seq 0
    ).toDF("doc_id", "n_toks")
    val out = pack(docs, maxLen = 512, buckets = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // no sequence exceeds capacity
    val bySeq = out.groupBy(t => (t._1, t._2))
    bySeq.foreach { case (k, rows) =>
      assert(rows.map(_._4).sum <= 512, s"sequence $k over capacity")
    }
    assert(bySeq.count(_._1._1 == 0L) == 2, "bucket 0 must split into two sequences")
    val over = out.find(_._3 == 1L).get
    assert(over._4 === 512L, "oversize doc must be truncated to maxLen")
    assert(over._5 === 1.0, "truncated doc fills its sequence exactly")
    assert(out.filter(_._1 == 2L).map(_._2).distinct.toSeq === Seq(0L),
      "zero-token docs must not open new sequences")
  }

  test("deterministic under repartitioning; every doc packed exactly once") {
    val docs = (0L until 500L).map(i => (i, (i * 37) % 700)).toDF("doc_id", "n_toks")
    val a = pack(docs, 512, 8).orderBy("bucket", "seq", "doc_id").collect().toSeq
    val b = pack(docs.repartition(13), 512, 8)
      .orderBy("bucket", "seq", "doc_id").collect().toSeq
    assert(a === b, "packing changed under input repartitioning")
    assert(a.map(_.getLong(2)).distinct.length === 500)
    // greedy first-fit: within a bucket, sequence ids are contiguous from 0
    a.groupBy(_.getLong(0)).foreach { case (bk, rows) =>
      val seqs = rows.map(_.getLong(1)).distinct.sorted
      assert(seqs === (0L until seqs.length).toSeq, s"bucket $bk has sequence gaps")
    }
  }

  test("matches an independent sequential reference on random sizes") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rnd = new scala.util.Random(1234)
    val docs = (0L until 400L).map(i => (i, rnd.nextInt(800).toLong))
    val maxLen = 512
    val buckets = 8
    // plain single-threaded greedy over each bucket in (md5, id) order
    val want = docs.groupBy(_._1 % buckets).toSeq.flatMap { case (bk, ds) =>
      var seq = 0L; var fill = 0L
      ds.sortBy(d => (md5hex(d._1.toString), d._1)).map { case (id, t0) =>
        val t = math.min(t0, maxLen.toLong)
        if (fill + t > maxLen && fill > 0) { seq += 1; fill = t } else fill += t
        (bk, seq, id, t)
      }
    }.sorted
    val got = pack(docs.toDF("doc_id", "n_toks"), maxLen, buckets)
      .select("bucket", "seq", "doc_id", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(got === want)
  }

  test("packed output flows through the sharded sink within shard bounds") {
    val dir = java.nio.file.Files.createTempDirectory("packshard").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_toks"))
    val packed = pack(docs, 512, 8)
    val n = packed.count()
    graft.sources.Csv.shardedSink(packed, s"$dir/shards", rowsPerShard = 16,
      approxRows = n)
    val files = new java.io.File(s"$dir/shards").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    val back = spark.read.parquet(s"$dir/shards")
    assert(back.count() === n, "sharded round-trip lost rows")
    // every shard respects the row bound
    val perFile = back.groupBy(input_file_name()).count().collect()
    assert(perFile.forall(_.getLong(1) <= 16L),
      s"shard over bound: ${perFile.map(_.getLong(1)).max}")
  }

  test("paddingEfficiency: hand-computed three-strategy accounting") {
    // lens 5, 100, 130, 0 at maxLen 64, buckets [16, 32]:
    //   chunks 1 + 2 + 3 + 0 = 6, useful = 235
    //   pad_to_max: 6 × 64 = 384 slots
    //   bucketed last chunks: 5→16, 36→64 (over both buckets), 2→16, 0→0
    //     slots = 16 + (64+64) + (2·64+16) + 0 = 288
    //   packed: ceil(235/64) = 4 sequences → 256 slots
    val df = Seq(5L, 100L, 130L, 0L).toDF("n_tok")
    val got = Packing.paddingEfficiency(df, "n_tok", maxLen = 64,
        buckets = Seq(16, 32))
      .orderBy("strategy").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got === Array(
      ("1_pad_to_max", 6L, 384L, 235L, 149L),
      ("2_bucketed", 6L, 288L, 235L, 53L),
      ("3_packed", 4L, 256L, 235L, 21L)))
  }
}
