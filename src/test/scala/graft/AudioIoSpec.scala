package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{AudioIo, PlantedAudio}

/** Real audio codec path: javax.sound.sampled decode behind the
  * Multimodal batch contract, against spec-written WAV/AU fixtures.
  */
class AudioIoSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("planted WAV/AU decode to planted params with exact sample sums; bad -> null") {
    val df = PlantedAudio.all.map(p => (p.id, p.blob)).toDF("id", "blob")
    val got = AudioIo.audioStats(df, "id", "blob").orderBy("id").collect()
      .map(r => r.getLong(0) -> r).toMap
    PlantedAudio.all.foreach { p =>
      val r = got(p.id)
      if (p.kind == "bad") {
        assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(6),
          s"undecodable id=${p.id} must be all-null")
      } else {
        assert(r.getString(1) === (if (p.kind == "wav") "wave" else "au"))
        assert(r.getInt(2) === p.channels && r.getInt(3) === p.rate && r.getInt(4) === 16)
        assert(r.getLong(5) === p.frames.toLong, s"frame count id=${p.id}")
        val base = p.kind match { case "wav" => p.id.toInt; case _ => 10 + (p.id - 100L).toInt }
        val want = (0 until p.frames * p.channels)
          .map(k => PlantedAudio.sampleAt(base, k).toLong).sum
        assert(r.getLong(6) === want, s"exact pcm sum id=${p.id}")
      }
    }
  }

  test("hand-written containers carry the documented byte layouts") {
    val w = PlantedAudio.all.head  // wav
    assert(new String(w.blob.take(4), "US-ASCII") === "RIFF")
    assert(new String(w.blob.slice(8, 12), "US-ASCII") === "WAVE")
    assert((w.blob(22) & 0xff) === w.channels)
    assert(((w.blob(24) & 0xff) | ((w.blob(25) & 0xff) << 8) |
      ((w.blob(26) & 0xff) << 16) | ((w.blob(27) & 0xff) << 24)) === w.rate)
    val a = PlantedAudio.all.find(_.kind == "au").get
    assert(new String(a.blob.take(4), "US-ASCII") === ".snd")
    assert((a.blob(15) & 0xff) === 3, "AU encoding 3 = 16-bit linear PCM")
    assert(((a.blob(16) & 0xff) << 24 | (a.blob(17) & 0xff) << 16 |
      (a.blob(18) & 0xff) << 8 | (a.blob(19) & 0xff)) === a.rate)
  }

  test("decode is deterministic under repartitioning") {
    val df = PlantedAudio.all.map(p => (p.id, p.blob)).toDF("id", "blob")
    val a = AudioIo.audioStats(df, "id", "blob").orderBy("id").collect().toSeq
    val b = AudioIo.audioStats(df.repartition(5), "id", "blob").orderBy("id").collect().toSeq
    assert(a === b)
  }
}
