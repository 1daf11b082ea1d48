package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Similarity

/** Delta-append to persisted ANN index layouts (VERDICT r16 item 3):
  * corpora grow; the maintenance contract is "assign only the delta,
  * append to the bucketed tables". These specs pin the two parity
  * claims the operators make:
  *  - IVF: under the FROZEN persisted quantizer the appended cells
  *    table is bit-identical to a fresh full-corpus assignment.
  *  - sign-LSH: below the bucket cap the appended index is exactly the
  *    fresh-rebuild index (capBuckets keeps the cap smallest ids, and
  *    a grown set can never re-admit a dropped row); AT the cap the
  *    semantics are first-committed-wins, asserted explicitly.
  * Plus the layout claim: appending through bucketedAppend keeps the
  * table's bucketing (the exchange-free join proofs survive appends).
  */
class IndexAppendSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // deterministic synthetic vectors: component j of id i is a fixed
  // integer mix — exact in doubles, so assignment parity is bit-exact
  private def vec(i: Long, dim: Int): Seq[Double] =
    (0 until dim).map(j => (((i * 31 + j * 17 + 7) % 19) - 9).toDouble)
  private def emb(ids: Seq[Long], dim: Int = 4) =
    ids.map(i => (i, vec(i, dim))).toDF("vec_id", "embedding")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case s: Seq[_] => s.toList
      case x         => x
    }: Seq[Any]).toSet

  test("IVF delta assignment ≡ fresh assignment under the frozen quantizer") {
    val base = emb(10L to 49L)
    val delta = emb(50L to 59L)
    val full = emb((10L to 59L))
    val idx = Similarity.ivfIndex(base, "vec_id", "embedding", nCells = 4)
    val deltaCells = Similarity.ivfDeltaCells(idx.centroids, delta,
      "vec_id", "embedding")
    // the full corpus assigned under the SAME persisted centroid frame
    val fullCells = Similarity.ivfDeltaCells(idx.centroids, full,
      "vec_id", "embedding")
    assert(rows(idx.cells) ++ rows(deltaCells) === rows(fullCells),
      "base ∪ delta must equal the fresh full assignment")
    // the delta never re-homes existing rows: disjoint id sets
    assert(rows(idx.cells.select("neighbor_id"))
      .intersect(rows(deltaCells.select("neighbor_id"))).isEmpty)
  }

  test("ivfAppend keeps table content and bucketing through the append") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val base = emb(0L to 39L)
    val delta = emb(40L to 49L)
    try {
      val idx = Similarity.ivfIndex(base, "vec_id", "embedding", nCells = 4)
      graft.sources.Csv.bucketedSink(idx.cells, "append_spec_ivf_cells",
        Seq("neighbor_id"), buckets = 4)
      graft.sources.Csv.bucketedSink(idx.centroids,
        "append_spec_ivf_centroids", Seq("cell"), buckets = 1)
      Similarity.ivfAppend("append_spec_ivf_cells",
        spark.table("append_spec_ivf_centroids"), delta,
        "vec_id", "embedding", buckets = 4)
      val got = spark.table("append_spec_ivf_cells")
      val want = Similarity.ivfDeltaCells(
        spark.table("append_spec_ivf_centroids"), emb(0L to 49L),
        "vec_id", "embedding")
      assert(rows(got) === rows(want))
      // bucketing survives: an id-keyed aggregation over the appended
      // table (now holding >1 file per bucket) plans with NO shuffle
      // exchange above the scan
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val agg = got.groupBy("neighbor_id").count()
        val exchanges = agg.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        assert(exchanges.isEmpty,
          "appended bucketed table must keep HashPartitioning(neighbor_id)")
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      // a mismatched bucket spec must throw, not silently de-bucket
      intercept[Exception] {
        graft.sources.Csv.bucketedAppend(
          Similarity.ivfDeltaCells(spark.table("append_spec_ivf_centroids"),
            emb(Seq(99L)), "vec_id", "embedding"),
          "append_spec_ivf_cells", Seq("neighbor_id"), buckets = 8)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS append_spec_ivf_cells")
      spark.sql("DROP TABLE IF EXISTS append_spec_ivf_centroids")
    }
  }

  // float variant for the PQ family (pqCodebook's cvec contract is
  // array<float> — the registered embedding column type)
  private def embF(ids: Seq[Long], dim: Int = 8) =
    ids.map(i => (i, vec(i, dim).map(_.toFloat))).toDF("vec_id", "embedding")

  test("PQ delta codes ≡ fresh codes under the frozen codebook; pqAppend keeps the table") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val base = embF(0L to 39L)
    val delta = embF(40L to 49L)
    val full = embF(0L to 49L)
    try {
      val idx = Similarity.pqIndex(base, "vec_id", "embedding",
        m = 4, k = 4, dim = 8)
      graft.sources.Csv.bucketedSink(idx.codes, "append_spec_pq_codes",
        Seq("neighbor_id"), buckets = 4)
      // persist the codebook like a deployment would (the model artifact)
      graft.sources.Csv.bucketedSink(idx.codebook, "append_spec_pq_cb",
        Seq("j", "code"), buckets = 1)
      Similarity.pqAppend("append_spec_pq_codes",
        spark.table("append_spec_pq_cb"), delta, "vec_id", "embedding",
        m = 4, dim = 8, buckets = 4)
      val got = spark.table("append_spec_pq_codes")
      // fresh encode of the FULL corpus under the SAME frozen codebook
      val want = Similarity.pqDeltaCodes(spark.table("append_spec_pq_cb"),
        full, "vec_id", "embedding", m = 4, dim = 8)
      assert(rows(got) === rows(want),
        "base ∪ delta codes must equal the fresh full encode under the frozen codebook")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val agg = got.groupBy("neighbor_id").count()
        val exchanges = agg.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        assert(exchanges.isEmpty,
          "appended PQ codes table must keep HashPartitioning(neighbor_id)")
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    } finally {
      spark.sql("DROP TABLE IF EXISTS append_spec_pq_codes")
      spark.sql("DROP TABLE IF EXISTS append_spec_pq_cb")
    }
  }

  test("IVFPQ delta cells ≡ fresh assignment+encode under the frozen models") {
    val base = embF(10L to 49L)
    val delta = embF(50L to 59L)
    val full = embF(10L to 59L)
    val idx = Similarity.ivfPqIndex(base, "vec_id", "embedding",
      nCells = 4, m = 4, k = 4, dim = 8)
    val deltaCells = Similarity.ivfPqDeltaCells(idx.centroids, idx.codebook,
      delta, "vec_id", "embedding", m = 4, dim = 8)
    val fullCells = Similarity.ivfPqDeltaCells(idx.centroids, idx.codebook,
      full, "vec_id", "embedding", m = 4, dim = 8)
    assert(rows(idx.cells) ++ rows(deltaCells) === rows(fullCells),
      "base ∪ delta must equal the fresh full (cell, codes) frame")
    assert(rows(idx.cells.select("neighbor_id"))
      .intersect(rows(deltaCells.select("neighbor_id"))).isEmpty)
  }

  test("bucketedDelete ≡ rebuild-minus-rows under the frozen quantizer; bucketing and one-file-per-bucket survive") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val buckets = 4
    val full = emb(0L to 49L)
    val delIds = Seq(3L, 7L, 21L, 44L)
    try {
      val idx = Similarity.ivfIndex(full, "vec_id", "embedding", nCells = 4)
      graft.sources.Csv.bucketedSink(idx.cells, "del_spec_ivf_cells",
        Seq("neighbor_id"), buckets)
      // an append first, so the delete also proves it compacts the
      // multi-file layout back down
      graft.sources.Csv.bucketedAppend(
        Similarity.ivfDeltaCells(idx.centroids, emb(50L to 59L),
          "vec_id", "embedding"),
        "del_spec_ivf_cells", Seq("neighbor_id"), buckets)
      graft.sources.Csv.bucketedDelete(spark, "del_spec_ivf_cells",
        delIds.toDF("vec_id"), "neighbor_id")
      val got = spark.table("del_spec_ivf_cells")
      // rebuild-minus-rows under the FROZEN quantizer: fresh assignment
      // of exactly the survivors under the same persisted centroids
      val want = Similarity.ivfDeltaCells(idx.centroids,
        emb((0L to 59L).filterNot(delIds.contains)), "vec_id", "embedding")
      assert(rows(got) === rows(want),
        "post-delete table must equal the survivor re-assignment")
      // one file per bucket (the rewrite compacts), bucketing survives
      val loc = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("del_spec_ivf_cells"))
        .location
      assert(new java.io.File(loc).listFiles()
        .count(_.getName.endsWith(".parquet")) === buckets)
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        assert(got.groupBy("neighbor_id").count()
          .queryExecution.executedPlan.collect {
            case e: ShuffleExchangeExec => e }.isEmpty,
          "deleted table must keep HashPartitioning(neighbor_id)")
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      // guards: multi-column id frame and non-bucketed table are
      // rejected, not silently rewritten
      intercept[IllegalArgumentException] {
        graft.sources.Csv.bucketedDelete(spark, "del_spec_ivf_cells",
          delIds.map(i => (i, i)).toDF("a", "b"), "neighbor_id")
      }
      spark.range(10).write.mode("overwrite").saveAsTable("del_spec_plain")
      val e = intercept[IllegalArgumentException] {
        graft.sources.Csv.bucketedDelete(spark, "del_spec_plain",
          delIds.toDF("id"), "id")
      }
      assert(e.getMessage.contains("no bucketing spec"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS del_spec_ivf_cells")
      spark.sql("DROP TABLE IF EXISTS del_spec_plain")
    }
  }

  test("tombstone read ≡ rewrite ≡ rebuild-minus-rows (IVFPQ), and the full-probe query forgets the rows") {
    val full = embF(0L to 49L)
    val delIds = Seq(2L, 13L, 28L, 41L)
    try {
      val idx = Similarity.ivfPqIndex(full, "vec_id", "embedding",
        nCells = 4, m = 4, k = 4, dim = 8)
      graft.sources.Csv.bucketedSink(idx.cells, "del_spec_ivfpq_cells",
        Seq("neighbor_id"), buckets = 4)
      val tomb = delIds.toDF("vec_id")
      // TOMBSTONE arm, materialized BEFORE the rewrite (the rewrite
      // invalidates the old file listing)
      val viaTomb = rows(Similarity.withoutTombstones(
        spark.table("del_spec_ivfpq_cells"), tomb))
      // REWRITE arm
      graft.sources.Csv.bucketedDelete(spark, "del_spec_ivfpq_cells",
        tomb, "neighbor_id")
      val viaRewrite = rows(spark.table("del_spec_ivfpq_cells"))
      // rebuild-minus-rows under the FROZEN models: fresh
      // assignment+encode of exactly the survivors
      val survivors = full.filter(!col("vec_id").isin(delIds: _*))
      val want = rows(Similarity.ivfPqDeltaCells(idx.centroids,
        idx.codebook, survivors, "vec_id", "embedding", m = 4, dim = 8))
      assert(viaTomb === viaRewrite, "tombstone read must equal the rewrite")
      assert(viaRewrite === want, "delete must equal rebuild-minus-rows")
      // the query path actually FORGETS the rows: full coverage over the
      // post-delete table equals exact search over the survivors, and no
      // deleted id ever surfaces as a neighbor
      val queries = full.filter(col("vec_id") < 3)
      def qrows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("query_id", "rnk").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            java.lang.Double.doubleToLongBits(r.getDouble(3))))
      val got = qrows(Similarity.ivfPqTopKFromIndex(
        spark.table("del_spec_ivfpq_cells"), idx.centroids, idx.codebook,
        full, queries, "vec_id", "embedding", k = 5, m = 4, dim = 8,
        nProbe = 4, rerank = 1000))
      val exact = qrows(Similarity.cosineTopK(survivors, queries,
        "vec_id", "embedding", k = 5))
      assert(got === exact)
      assert(!got.exists(r => delIds.contains(r._3)),
        "a deleted id surfaced as a neighbor")
      // withoutTombstones rejects a multi-column tombstone frame
      intercept[IllegalArgumentException] {
        Similarity.withoutTombstones(spark.table("del_spec_ivfpq_cells"),
          delIds.map(i => (i, i)).toDF("a", "b"))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS del_spec_ivfpq_cells")
    }
  }

  test("bucketedCompact: content hash, bucketing, and one-file-per-bucket restored") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val buckets = 4
    try {
      val idx = Similarity.ivfIndex(emb(0L to 39L), "vec_id", "embedding",
        nCells = 4)
      graft.sources.Csv.bucketedSink(idx.cells, "compact_spec_cells",
        Seq("neighbor_id"), buckets)
      // five appends -> up to 5 extra files per bucket (the small-files
      // accumulation bucketedCompact exists to undo)
      (0 until 5).foreach { a =>
        graft.sources.Csv.bucketedAppend(
          Similarity.ivfDeltaCells(idx.centroids,
            emb((40L + a * 10) until (50L + a * 10)), "vec_id", "embedding"),
          "compact_spec_cells", Seq("neighbor_id"), buckets)
      }
      def tableFiles(): Int = {
        val loc = spark.sessionState.catalog
          .getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier("compact_spec_cells"))
          .location
        new java.io.File(loc).listFiles()
          .count(f => f.getName.endsWith(".parquet"))
      }
      val before = rows(spark.table("compact_spec_cells"))
      val filesBefore = tableFiles()
      assert(filesBefore > buckets,
        s"precondition: appends must leave >$buckets files, got $filesBefore")
      graft.sources.Csv.bucketedCompact(spark, "compact_spec_cells")
      assert(rows(spark.table("compact_spec_cells")) === before,
        "compaction must not change table content")
      assert(tableFiles() === buckets,
        "compaction must leave exactly one file per bucket")
      // bucketing metadata survives the rewrite: id-keyed agg plans
      // with no exchange above the scan
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val agg = spark.table("compact_spec_cells")
          .groupBy("neighbor_id").count()
        assert(agg.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e }.isEmpty,
          "compacted table must keep HashPartitioning(neighbor_id)")
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      // a non-bucketed table is rejected, not silently rewritten
      spark.range(10).write.mode("overwrite")
        .saveAsTable("compact_spec_plain")
      val e = intercept[IllegalArgumentException] {
        graft.sources.Csv.bucketedCompact(spark, "compact_spec_plain")
      }
      assert(e.getMessage.contains("no bucketing spec"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS compact_spec_cells")
      spark.sql("DROP TABLE IF EXISTS compact_spec_plain")
    }
  }

  test("LSH delta ∪ existing ≡ fresh rebuild below the cap (including smaller delta ids)") {
    val base = emb(20L to 49L)
    val delta = emb(0L to 9L)   // ids BELOW every existing member
    val full = emb((0L to 9L) ++ (20L to 49L))
    val cap = 100 // finite, non-binding: the cap-aware join path runs
    val existing = Similarity.signLshIndex(base, "vec_id", "embedding",
      dim = 4, bits = 2, tables = 2, maxBucketSize = cap)
    val deltaRows = Similarity.signLshIndexDelta(existing, delta,
      "vec_id", "embedding", dim = 4, bits = 2, tables = 2,
      maxBucketSize = cap)
    val fresh = Similarity.signLshIndex(full, "vec_id", "embedding",
      dim = 4, bits = 2, tables = 2, maxBucketSize = cap)
    assert(rows(existing) ++ rows(deltaRows) === rows(fresh),
      "below the cap, append must reproduce the fresh rebuild exactly")
  }

  test("LSH delta fills only the remaining slots at the cap (first-committed-wins)") {
    // bits = 0 → one bucket per table, so bucket occupancy is exact
    val cap = 5
    def idxOf(ids: Seq[Long]) = Similarity.signLshIndex(emb(ids),
      "vec_id", "embedding", dim = 4, bits = 0, tables = 1,
      maxBucketSize = cap)
    // full bucket: 8 base rows capped to the 5 smallest; a delta with
    // SMALLER ids must not evict committed members (a rebuild would)
    val fullBucket = idxOf(10L to 17L)
    assert(fullBucket.count() === 5)
    val none = Similarity.signLshIndexDelta(fullBucket, emb(1L to 3L),
      "vec_id", "embedding", dim = 4, bits = 0, tables = 1,
      maxBucketSize = cap)
    assert(none.count() === 0, "a full bucket admits no delta rows")
    // partial bucket: 3 base rows, 2 free slots → the 2 smallest delta
    // ids fill them, the rest are dropped
    val partial = idxOf(10L to 12L)
    val fills = Similarity.signLshIndexDelta(partial, emb(1L to 4L),
      "vec_id", "embedding", dim = 4, bits = 0, tables = 1,
      maxBucketSize = cap)
    assert(rows(fills.select("neighbor_id")) ===
      Set(Seq[Any](1L), Seq[Any](2L)))
  }

  test("uncapped LSH delta is the plain membership frame (no count scan)") {
    val base = emb(0L to 9L)
    val delta = emb(10L to 14L)
    val existing = Similarity.signLshIndex(base, "vec_id", "embedding",
      dim = 4, bits = 2, tables = 2, maxBucketSize = Int.MaxValue)
    val deltaRows = Similarity.signLshIndexDelta(existing, delta,
      "vec_id", "embedding", dim = 4, bits = 2, tables = 2,
      maxBucketSize = Int.MaxValue)
    val fresh = Similarity.signLshIndex(emb(0L to 14L), "vec_id",
      "embedding", dim = 4, bits = 2, tables = 2,
      maxBucketSize = Int.MaxValue)
    assert(rows(existing) ++ rows(deltaRows) === rows(fresh))
  }

  test("bucketedCompact under an ACTIVE serve stream: observed interaction + checkpointed-restart recovery") {
    // VERDICT r18 item 5: bucketedCompact drops and rewrites the table
    // in place while serving streams re-scan it every trigger. This
    // pins the OBSERVED interaction on the live stream and proves the
    // recovery contract: a stream started BEFORE compaction holds the
    // pre-compact file listing (Spark resolves a catalog relation's
    // file index at plan time), so its post-compact trigger either
    // fails loudly (stale files gone) or — if no trigger touches the
    // window — keeps serving; it never silently serves wrong rows,
    // because the compacted CONTENT is identical (the bucketedCompact
    // parity pin) and a missing file is an error, not an empty scan. A
    // checkpointed RESTART re-resolves the table and must produce
    // bit-identical results to the batch operator over the compacted
    // table — the documented maintenance contract: compact in a
    // maintenance window, or expect ≤ one failed trigger and restart.
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streaming
    implicit val sqlCtx = spark.sqlContext
    val base = emb(0L to 39L)
    val delta = emb(40L to 49L)
    val full = emb(0L to 49L)
    val idx = Similarity.ivfIndex(base, "vec_id", "embedding", nCells = 4)
    try {
      graft.sources.Csv.bucketedSink(idx.cells, "compact_serve_cells",
        Seq("neighbor_id"), 4)
      graft.sources.Csv.bucketedAppend(
        Similarity.ivfDeltaCells(idx.centroids, delta, "vec_id", "embedding"),
        "compact_serve_cells", Seq("neighbor_id"), 4)
      val vecs = full.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_compact_serve_ckpt").toString
      val input = MemoryStream[(Timestamp, Long, Array[Double])]
      val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Double)]()
      def start() = Streaming.ivfTopKStream(
          input.toDF().toDF("ts", "vec_id", "embedding"),
          "ts", "vec_id", "embedding",
          spark.table("compact_serve_cells"), // resolved at stream build
          idx.centroids, full, k = 5, nProbe = 2)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r =>
            out.add((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      def t(min: Int) = new Timestamp(
        Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L)
      val q1 = start()
      val preCompactFailure: Option[Throwable] =
        try {
          input.addData((t(0), 2L, vecs(2L)))
          q1.processAllAvailable() // healthy pre-compact trigger
          // compact while q1 is live, then drive another trigger
          graft.sources.Csv.bucketedCompact(spark, "compact_serve_cells")
          input.addData((t(40), 7L, vecs(7L)))
          q1.processAllAvailable()
          None
        } catch { case e: Throwable => Some(e) }
        finally q1.stop()
      // the in-flight stream fails LOUDLY — the pre-compact file listing
      // points at files the drop-and-rewrite deleted, and a missing file
      // is an error (FAILED_READ_FILE.FILE_NOT_EXIST → STREAM_FAILED),
      // never an empty scan — so a live serve NEVER silently serves
      // wrong/partial index rows across a compaction (measured: this
      // exact exception chain, round 19)
      info(s"in-flight compaction outcome: " +
        preCompactFailure.map(e => e.getClass.getSimpleName + ": " +
          String.valueOf(e.getMessage).take(200)).getOrElse("survived"))
      assert(preCompactFailure.isDefined,
        "the post-compaction trigger of the pre-compact stream must fail " +
          "loudly (stale file listing) — silent success would mean it " +
          "served from files the compaction should have removed")
      assert(String.valueOf(preCompactFailure.get.getMessage)
          .contains("FAILED_READ_FILE") ||
        preCompactFailure.get.toString.contains("STREAM_FAILED"),
        s"expected the stale-file-listing failure, got: ${preCompactFailure.get}")
      // restart from the checkpoint: re-resolves the compacted table
      val q2 = start()
      try {
        input.addData((t(41), 11L, vecs(11L)))
        q2.processAllAvailable()
        input.addData((t(120), 98L, vecs(0L)))
        q2.processAllAvailable()
        input.addData((t(240), 99L, vecs(0L)))
        q2.processAllAvailable()
        import scala.jdk.CollectionConverters._
        val got = out.asScala.filter(r => r._1 == 7L || r._1 == 11L)
          .toSeq.distinct.sortBy(r => (r._1, r._2))
        val want = Similarity.ivfTopKFromIndex(
            spark.table("compact_serve_cells"), idx.centroids, full,
            full.filter(col("vec_id").isin(7L, 11L)),
            "vec_id", "embedding", k = 5, nProbe = 2)
          .orderBy("query_id", "rnk").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .toSeq
        assert(got === want,
          s"post-compaction serve results must equal the batch operator " +
            s"over the compacted table: $got vs $want")
      } finally q2.stop()
    } finally spark.sql("DROP TABLE IF EXISTS compact_serve_cells")
  }
}
