package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Csv, FixedWidth}
import graft.geo.Geo

/** Source-format and geo tests over FIXTURES.md §A-shaped synthetic files. */
class SourcesGeoSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def tmpFile(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft_src").toFile
    val f = new java.io.File(dir, name)
    Files.writeString(f.toPath, content)
    f.getAbsolutePath
  }

  test("sharded sink bounds rows per file and round-trips all rows") {
    val df = (1 to 1000).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    val dir = Files.createTempDirectory("graft_shards").toString
    Csv.shardedSink(df, dir, rowsPerShard = 150, approxRows = 1000)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length >= 1000 / 150, s"too few shards: ${files.length}")
    files.foreach { f =>
      val n = spark.read.parquet(f).count()
      assert(n <= 150, s"shard $f has $n rows")
    }
    assert(spark.read.parquet(dir).count() === 1000)
  }

  test("bucketedSink stale-location cleanup skips non-file warehouse schemes (no throw)") {
    // VERDICT r17 item 5: on an hdfs/s3 warehouse the old inline
    // `new File(URI)` threw IllegalArgumentException BEFORE the write.
    // The factored resolver must return None (skip, don't die) for any
    // non-file scheme, and a local directory for file/scheme-less URIs.
    import java.net.URI
    assert(Csv.localCleanupTarget(new URI("hdfs://nn:8020/warehouse/t")).isEmpty)
    assert(Csv.localCleanupTarget(new URI("s3a://bucket/warehouse/t")).isEmpty)
    assert(Csv.localCleanupTarget(new URI("file:/tmp/wh/t"))
      .exists(_.getPath == "/tmp/wh/t"))
    // scheme-less: the local-warehouse default saveAsTable resolves to
    assert(Csv.localCleanupTarget(new URI("/tmp/wh/t2"))
      .exists(_.getPath == "/tmp/wh/t2"))
  }

  test("bucketed tables join with no exchange and match the plain join") {
    // the co-located-join layout: both sides bucketed on the join key
    // with the same bucket count -> the sort-merge join consumes bucket
    // outputs directly, no shuffle stage on either side
    val facts = (1 to 500).map(i => (i % 50, i, i * 1.5)).toDF("k", "seq", "v")
    val dims = (0 until 50).map(i => (i, s"name_$i")).toDF("k", "name")
    Csv.bucketedSink(facts, "graft_bucket_facts", Seq("k"), 8)
    Csv.bucketedSink(dims, "graft_bucket_dims", Seq("k"), 8)
    try {
      val bf = spark.table("graft_bucket_facts")
      val bd = spark.table("graft_bucket_dims")
      // disable broadcast so the join's shuffle behavior is what's tested
      val joined = bf.join(bd.hint("merge"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      val got = joined.groupBy("name").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = facts.join(dims, "k").groupBy("name").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_dims")
    }
  }

  test("fixed-width .dly parse: header fields + 31 day groups (S5, A3)") {
    // ID(11) YEAR(4) MONTH(2) ELEMENT(4) then 31 x [VALUE(5) M Q S]
    def grp(v: String) = f"${v}%5s" + "  X"
    val line1 = "USC00110072" + "2016" + "01" + "TMAX" +
      (1 to 31).map(d => grp(if (d <= 3) (d * 10).toString else "-9999")).mkString
    val line2 = "CA00304N001" + "2016" + "02" + "PRCP" +
      (1 to 31).map(_ => grp("25")).mkString
    val path = tmpFile("fix.dly", line1 + "\n" + line2 + "\n")
    val df = FixedWidth.readDly(spark, path)
    val rows = df.orderBy("ID").collect()
    assert(rows.length === 2)
    val us = rows.find(_.getString(0) == "USC00110072").get
    assert(us.getInt(1) === 2016 && us.getInt(2) === 1 && us.getString(3) === "TMAX")
    assert(us.getAs[Int]("VALUE1") === 10)
    assert(us.getAs[Int]("VALUE3") === 30)
    assert(us.getAs[Int]("VALUE4") === -9999)
    assert(us.getAs[String]("SFLAG1") === "X")
    assert(us.getAs[String]("MFLAG1") === null) // blank flag -> null
  }

  test("fixed-width stations parse with canonical offsets (S6, A4)") {
    def pad(s: String, w: Int) = s.padTo(w, ' ')
    def num(v: Double, w: Int) = f"$v%8.4f".trim.reverse.padTo(w, ' ').reverse
    val l1 = pad("USC00110072", 11) + " " + num(41.9419, 8) + " " + num(-88.6931, 9) +
      " " + " 226.0" + " " + "IL" + " " + pad("PAW PAW 2 S", 30) + " " +
      pad("", 3) + " " + pad("HCN", 3) + " " + pad("", 5)
    val l2 = pad("CA002100805", 11) + " " + num(68.3167, 8) + " " + num(-133.5333, 9) +
      " " + "  68.0" + " " + "  " + " " + pad("AKLAVIK A", 30) + " " +
      pad("", 3) + " " + pad("", 3) + " " + pad("71113", 5)
    val path = tmpFile("stations.txt", l1 + "\n" + l2 + "\n")
    val df = FixedWidth.readStations(spark, path).orderBy("ID")
    val rows = df.collect()
    val ca = rows(0); val us = rows(1)
    assert(us.getString(0) === "USC00110072")
    assert(math.abs(us.getDouble(1) - 41.9419) < 1e-9)
    assert(math.abs(us.getDouble(2) - (-88.6931)) < 1e-9)
    assert(us.getDouble(3) === 226.0)
    assert(us.getAs[String]("city") === "IL PAW PAW 2 S")
    assert(ca.getAs[String]("unk3") === "71113")
  }

  test("skip-preamble CSV scan (S4, A7) with NM sentinel intact") {
    val content =
      """EIA consumption export
        |generated: 2024
        |units: thousand tons
        |source: EIA-923
        |description,units,Jan 2016,Feb 2016
        |Michigan : coal,tons,"1,234",NM
        |Michigan : natural gas,mcf,555,666
        |""".stripMargin
    val path = tmpFile("consumption.csv", content)
    val df = Csv.skipPreamble(spark, path, 4)
    assert(df.columns.toSeq === Seq("description", "units", "Jan 2016", "Feb 2016"))
    val rows = df.orderBy("description").collect()
    assert(rows.length === 2)
    assert(rows(0).getString(0) === "Michigan : coal")
    assert(rows(0).getString(2) === "1,234")
    assert(rows(0).getString(3) === "NM")
  }

  test("downloadToStaging fetches URLs to staging and feeds the CSV scan (S1)") {
    val csv = "city,kwh\nDetroit,12\nLansing,7\n"
    val src = tmpFile("eia_export.csv", csv)
    val staging = Files.createTempDirectory("graft_staging").toString
    // file: URL through the default URL-stream transport — the same code
    // path an HTTP(S) URL takes where egress exists
    val staged = Csv.downloadToStaging(Seq("file://" + src), staging)
    assert(staged === Seq(s"$staging/0000-eia_export.csv"))
    val df = Csv.scan(spark, staged.head).orderBy("city")
    assert(df.collect().map(r => (r.getString(0), r.getInt(1))).toSeq ===
      Seq(("Detroit", 12), ("Lansing", 7)))

    // injectable transport: no filesystem/network dependence. Two URLs
    // sharing a basename must stage to distinct files (index prefix),
    // and a trailing-slash URL falls back to its last non-empty segment.
    val staged2 = Csv.downloadToStaging(
      Seq("synthetic://x/inline.csv", "synthetic://y/inline.csv", "synthetic://host/dir/"),
      staging,
      u => new java.io.ByteArrayInputStream(s"a,b\n$u\n".getBytes))
    assert(staged2.distinct.size === 3)
    assert(staged2(0).endsWith("0000-inline.csv") && staged2(1).endsWith("0001-inline.csv"))
    assert(staged2(2).endsWith("0002-dir"))
    assert(Files.readString(java.nio.file.Paths.get(staged2(1)))
      .contains("synthetic://y/inline.csv"))
  }

  test("downloadToStaging drives a REAL http:// URL end-to-end (S1, loopback)") {
    // In-process loopback server (com.sun.net.httpserver, JDK built-in):
    // the DEFAULT URL-stream transport fetches over actual HTTP — socket,
    // status line, headers, chunked body — with zero egress. This is the
    // exact ingress path of the reference's EIA fetch (ETL.py:56-63).
    val csv = "city,kwh\nDetroit,12\nLansing,7\nFlint,3\n"
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.createContext("/exports/eia_http.csv",
        (ex: com.sun.net.httpserver.HttpExchange) => {
          val body = csv.getBytes("UTF-8")
          ex.getResponseHeaders.add("Content-Type", "text/csv")
          ex.sendResponseHeaders(200, body.length.toLong)
          try ex.getResponseBody.write(body) finally ex.close()
        })
      server.start()
      val port = server.getAddress.getPort
      val staging = Files.createTempDirectory("graft_staging_http").toString
      val staged = Csv.downloadToStaging(
        Seq(s"http://127.0.0.1:$port/exports/eia_http.csv"), staging)
      assert(staged === Seq(s"$staging/0000-eia_http.csv"))
      assert(Files.readString(java.nio.file.Paths.get(staged.head)) === csv)
      val df = Csv.scan(spark, staged.head).orderBy("city")
      assert(df.collect().map(r => (r.getString(0), r.getInt(1))).toSeq ===
        Seq(("Detroit", 12), ("Flint", 3), ("Lansing", 7)))
    } finally server.stop(0)
  }

  test("CSV sink round-trip (K1) and per-file sink layout (K2)") {
    val df = Seq((1, "a", 1.5), (2, "b", 2.5)).toDF("id", "s", "v")
    val out = Files.createTempDirectory("graft_sink").toString + "/out"
    Csv.sink(df, out)
    val back = Csv.scan(spark, out).orderBy("id").collect()
    assert(back.map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1, "a", 1.5), (2, "b", 2.5)))

    val tagged = df.withColumn("src", concat(lit("f"), col("id")))
    val out2 = Files.createTempDirectory("graft_sink2").toString + "/out"
    Csv.sinkPerFile(tagged, "src", out2)
    val dirs = new java.io.File(out2).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("src=f1", "src=f2"))
  }

  test("JSONL round-trip preserves escapes, unicode, nulls; corrupt lines stay visible") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val rows = Seq(
      (1L, "plain text", Some(10L)),
      (2L, "quotes \" and \\ backslash\tand tab\nand newline", Some(20L)),
      (3L, "unicode é中文 😀", None),
      (4L, null.asInstanceOf[String], Some(40L)))
    val df = rows.toDF("id", "text", "n")
    val dir = Files.createTempDirectory("graft_jsonl").toString + "/out"
    graft.sources.Jsonl.sink(df, dir)
    val back = graft.sources.Jsonl.scan(spark, dir, Some(df.schema))
      .orderBy("id").as[(Long, String, Option[Long])].collect().toSeq
    assert(back === rows)

    // corrupt line: declared _corrupt_record column captures it as a row
    val f = Files.createTempDirectory("graft_jsonl2").resolve("bad.jsonl")
    Files.writeString(f,
      """{"id":1,"text":"ok"}
        |{"id":2,  THIS IS NOT JSON
        |{"id":3,"text":"also ok"}
        |""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    // Spark refuses plans whose only referenced file column is
    // _corrupt_record (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize
    // the full rows once, then inspect
    val got = graft.sources.Jsonl.scan(spark, f.toString, Some(schema))
      .collect()
    assert(got.length === 3)
    assert(got.count(r => !r.isNullAt(2)) === 1)
    assert(got.count(r => r.isNullAt(2)) === 2)
  }

  test("ray-cast point-in-polygon: inside, outside, vertex, edge (J4, A5)") {
    val square: Geo.Ring = Array((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    assert(Geo.pointInPolygon(2.0, 2.0, square))
    assert(!Geo.pointInPolygon(5.0, 2.0, square))
    assert(!Geo.pointInPolygon(-1.0, -1.0, square))
    assert(Geo.pointInPolygon(0.0, 0.0, square))   // vertex
    assert(Geo.pointInPolygon(2.0, 0.0, square))   // edge
    // non-convex: C-shape; the notch must be outside
    val cShape: Geo.Ring = Array((0.0, 0.0), (6.0, 0.0), (6.0, 2.0), (2.0, 2.0),
      (2.0, 4.0), (6.0, 4.0), (6.0, 6.0), (0.0, 6.0))
    assert(Geo.pointInPolygon(1.0, 3.0, cShape))
    assert(!Geo.pointInPolygon(4.0, 3.0, cShape), "notch point must be outside")
  }

  test("native point_in_polygon expression ≡ driver ray-cast; no UDF in the plan") {
    import org.apache.spark.sql.functions.col
    val square: Geo.Ring = Array((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    val cShape: Geo.Ring = Array((0.0, 0.0), (6.0, 0.0), (6.0, 2.0), (2.0, 2.0),
      (2.0, 4.0), (6.0, 4.0), (6.0, 6.0), (0.0, 6.0))
    // grid including vertices, edges, the notch, and far-outside points
    val pts = (for (xi <- -2 to 14; yi <- -2 to 14)
      yield (xi * 0.5, yi * 0.5)).toSeq
    for (ring <- Seq(square, cShape)) {
      val df = pts.toDF("lon", "lat")
        .withColumn("in", Geo.inPolygon(col("lon"), col("lat"), ring))
      // WholeStageCodegen path ≡ driver-side reference implementation
      df.collect().foreach { r =>
        val want = Geo.pointInPolygon(r.getDouble(0), r.getDouble(1), ring)
        assert(r.getBoolean(2) === want, s"(${r.getDouble(0)}, ${r.getDouble(1)})")
      }
      // interpreted (non-codegen) eval path agrees too
      val e = graft.functions.PointInPolygon(
        org.apache.spark.sql.catalyst.expressions.Literal(1.0),
        org.apache.spark.sql.catalyst.expressions.Literal(3.0),
        ring.map(_._1), ring.map(_._2))
      assert(e.eval(null) === Geo.pointInPolygon(1.0, 3.0, ring))
      // the predicate must be a native expression, not a ScalaUDF stage-break
      val plan = df.filter(col("in")).queryExecution.executedPlan.toString
      assert(!plan.contains("UDF"), s"ScalaUDF crept back into:\n$plan")
    }
    // null coordinates: null out (filter-equivalent to the old UDF's false)
    val withNull = Seq[(java.lang.Double, java.lang.Double)]((2.0, 2.0), (null, 2.0))
      .toDF("lon", "lat")
    val kept = withNull
      .filter(Geo.inPolygon(col("lon"), col("lat"), square)).collect()
    assert(kept.length === 1 && kept(0).getDouble(0) === 2.0)
  }

  test("polygon filter over a stations frame + GeoJSON ring read (S7)") {
    val square: Geo.Ring = Array((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    val stations = Seq(
      ("US1", -88.0, 41.0), ("US2", 2.0, 2.0), ("US3", 3.9, 0.1), ("CA1", 10.0, 10.0))
      .toDF("ID", "long", "lat")
    val kept = Geo.filterInPolygon(stations, "long", "lat", square)
      .select("ID").as[String].collect().sorted
    assert(kept.toSeq === Seq("US2", "US3"))

    val geojson =
      """{"type":"FeatureCollection","features":[{"type":"Feature","properties":{},
        |"geometry":{"type":"Polygon","coordinates":[[[0.0,0.0],[4.0,0.0],[4.0,4.0],[0.0,4.0],[0.0,0.0]]]}}]}""".stripMargin
    val path = tmpFile("poly.geojson", geojson)
    val ring = Geo.readPolygonRing(path)
    assert(ring.length === 5)
    assert(ring(2) === ((4.0, 4.0)))
  }
}
