package graft

import org.apache.spark.CheckpointDirTestHook
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Clustering
import graft.ops.Pin

/** The reliable-checkpoint branch of [[graft.ops.Pin]] — the path a real
  * cluster run takes first (`sc.setCheckpointDir` is the cluster
  * deployment contract; localCheckpoint blocks are unreplicated executor
  * state). Carried VERDICT r10/r11 item: until this spec, that branch
  * had never executed under test.
  */
class PinSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Runs `body` with a temp reliable checkpoint dir configured, then
    * restores localCheckpoint mode and deletes the dir — suites share
    * one SparkContext, so leaking the setting would silently flip every
    * later Pin call onto the disk path.
    */
  private def withCheckpointDir[A](body: java.io.File => A): A = {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "shared session already has a checkpoint dir — another spec leaked it")
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    sc.setCheckpointDir(dir.getAbsolutePath)
    try body(dir)
    finally {
      CheckpointDirTestHook.clear(sc)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  test("Pin.pin reliable branch: same rows, actually checkpointed to the dir") {
    val df = spark.range(0, 1000, 1, 7).toDF("id")
      .withColumn("v", col("id") % 13)
    val baseline = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    withCheckpointDir { dir =>
      val pinned = Pin.pin(df)
      val got = pinned.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got === baseline)
      // prove the RELIABLE path ran, not localCheckpoint: checkpoint
      // part-files landed under the configured dir
      def files(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles()).map(_.toSeq.flatMap(c =>
          if (c.isDirectory) files(c) else Seq(c))).getOrElse(Seq.empty)
      assert(files(dir).exists(_.getName.startsWith("part-")),
        s"no checkpoint part-files under $dir — Pin took the local branch")
      // the pinned frame must survive with the dir gone only AFTER this
      // block; within it, downstream reuse reads the checkpoint files
      assert(pinned.count() === 1000L)
    }
    // restored: local mode again
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    assert(Pin.pin(df).count() === 1000L)
  }

  test("dtwKMeansExact: reliable-checkpoint path reproduces local-path results exactly") {
    def noisy(base: Array[Double], seed: Int): Array[Double] = {
      val r = new scala.util.Random(seed)
      base.map(_ + r.nextDouble() * 0.1)
    }
    val flat = Array.fill(12)(0.0)
    val ramp = Array.tabulate(12)(_.toDouble)
    val sine = Array.tabulate(12)(i => 5 * math.sin(i * 0.7))
    val rows = (0 until 5).flatMap { i =>
      Seq((s"flat$i", noisy(flat, i).toSeq),
        (s"ramp$i", noisy(ramp, 100 + i).toSeq),
        (s"sine$i", noisy(sine, 200 + i).toSeq))
    }
    val df = rows.toDF("id", "vec")
    def run() = {
      val res = Clustering.dtwKMeansExact(df, "id", "vec", k = 3, maxIter = 5)
      (res.assignments.collect()
        .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).sortBy(_._1).toSeq,
        res.centroids.map(_.toSeq).toSeq)
    }
    val (localAssign, localCents) = run()
    val (reliableAssign, reliableCents) = withCheckpointDir { _ => run() }
    // the decimal-exact protocol is deterministic, so the reliable path
    // must be BIT-identical, not merely equivalent
    assert(reliableAssign === localAssign)
    assert(reliableCents === localCents)
  }
}
