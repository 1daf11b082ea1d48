package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tar

/** Byte-level ustar spec checks for the tar shard writer/parser —
  * the q151 oracle depends on offsets being the pure cumsum function of
  * the entry sizes, and external-tool readability depends on the header
  * fields holding the POSIX.1-1988 layout exactly.
  */
class TarSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  test("round-trip: names, sizes, payloads, offsets (incl. 0/512/513 edges)") {
    val entries = Seq(
      ("a.txt", bytes("hello world")),
      ("empty.bin", Array.empty[Byte]),
      ("block.bin", Array.fill[Byte](512)(7)),
      ("blockplus.bin", Array.fill[Byte](513)(9)),
      ("z.txt", bytes("tail")))
    val tar = Tar.write(entries.iterator)
    val parsed = Tar.parse(tar)
    assert(parsed.map(_.name) === entries.map(_._1))
    assert(parsed.map(_.size) === entries.map(_._2.length.toLong))
    parsed.zip(entries).foreach { case (e, (_, p)) =>
      assert(e.payload.toSeq === p.toSeq, s"payload mismatch for ${e.name}")
    }
    // offsets follow the cumsum spec: off_i = Σ_{j<i}(512 + pad512(sz_j)) + 512
    def pad(n: Long) = ((n + 511) / 512) * 512
    val expected = entries.map(_._2.length.toLong)
      .scanLeft(0L)((acc, sz) => acc + 512 + pad(sz)).init.map(_ + 512)
    assert(parsed.map(_.offset) === expected)
    // archive ends with two zero blocks and is block-aligned
    assert(tar.length % 512 === 0)
    assert(tar.takeRight(1024).forall(_ == 0))
  }

  test("header holds the POSIX layout: magic, version, checksum, octal size") {
    val h = Tar.header("doc.txt", 1234L)
    assert(h.length === 512)
    assert(new String(h, 257, 6, StandardCharsets.UTF_8) === "ustar\u0000")
    assert(new String(h, 263, 2, StandardCharsets.UTF_8) === "00")
    assert(h(156) === '0'.toByte)
    // size field: 11 octal digits + space
    assert(new String(h, 124, 12, StandardCharsets.UTF_8) === f"${1234L}%011o ")
    // checksum recomputes over the header with the field as spaces
    val copy = h.clone()
    java.util.Arrays.fill(copy, 148, 156, ' '.toByte)
    val sum = copy.map(_ & 0xff).sum
    val written = new String(h, 148, 6, StandardCharsets.UTF_8)
    assert(java.lang.Long.parseLong(written, 8) === sum.toLong)
    assert(h(154) === 0.toByte && h(155) === ' '.toByte)
  }

  test("round-trip holds for randomized entry sequences") {
    val rnd = new scala.util.Random(5)
    (1 to 25).foreach { _ =>
      val entries = (1 to rnd.nextInt(10) + 1).map { i =>
        val payload = Array.fill[Byte](rnd.nextInt(2000))(rnd.nextInt().toByte)
        (f"member_$i%03d.bin", payload)
      }
      val parsed = Tar.parse(Tar.write(entries.iterator))
      assert(parsed.map(e => (e.name, e.payload.toSeq)) ===
        entries.map { case (n, p) => (n, p.toSeq) })
    }
  }

  test("writer rejects over-long names and parser stops at the end marker") {
    intercept[IllegalArgumentException](Tar.header("x" * 100, 1L))
    val tar = Tar.write(Iterator(("one.txt", bytes("abc"))))
    // garbage after the end marker must not be read as an entry
    val extended = tar ++ Array.fill[Byte](512)(42)
    assert(Tar.parse(extended).map(_.name) === Seq("one.txt"))
  }

  test("parser rejects truncated and size-corrupt shards with a clear error") {
    val tar = Tar.write(Iterator(("one.txt", Array.fill[Byte](700)(7))))
    // truncation inside the payload: a clean require, not an index error
    val truncated = java.util.Arrays.copyOfRange(tar, 0, 512 + 100)
    val e1 = intercept[IllegalArgumentException](Tar.parse(truncated))
    assert(e1.getMessage.contains("runs past shard end"))
    // corrupt the octal size field to blanks
    val corrupt = tar.clone()
    (124 until 136).foreach(i => corrupt(i) = ' '.toByte)
    val e2 = intercept[IllegalArgumentException](Tar.parse(corrupt))
    assert(e2.getMessage.contains("non-octal size"))
  }
}
