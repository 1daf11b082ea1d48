package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** POSIX ustar (tar) shard reader/writer in pure JVM — the WebDataset
  * convention for training shards: a corpus is stored as tar files whose
  * members are the samples, readable by any standard tar tool and
  * streamable sequentially (the property that makes tar the de-facto
  * multimodal shard format). Own-spec implementation like the RIFF/AVI
  * demux (`multimodal/VideoIo.scala`): headers are written and parsed
  * against the POSIX.1-1988 ustar layout, not a library.
  *
  * Determinism contract: mode/uid/gid/mtime are fixed constants (0644 /
  * 0 / 0 / epoch), so a shard's bytes are a pure function of its entry
  * (name, payload) sequence — two engines that agree on the entries
  * agree on every byte offset, which is what makes the q151 oracle a
  * plain window cumsum: entry i's payload starts at
  * Σ_{j<i} (512 + pad512(size_j)) + 512.
  *
  * Scale shape: one shard = one bucket's entries built in a single
  * streaming pass inside `mapPartitions` (the `text/Packing` pattern —
  * buckets are the parallel unit, shard size is bounded by bucketing,
  * never by corpus size). Reading is sequential per shard: parse
  * headers, slice payloads — no random access needed, so a shard can
  * stream from any blob store.
  */
object Tar {

  final case class Entry(name: String, offset: Long, size: Long, payload: Array[Byte])

  private val BLOCK = 512

  private def pad512(n: Long): Long = ((n + BLOCK - 1) / BLOCK) * BLOCK

  /** ustar header block for one member (POSIX.1-1988 field offsets). */
  def header(name: String, size: Long): Array[Byte] = {
    require(name.getBytes(StandardCharsets.UTF_8).length < 100,
      s"name too long for ustar name field: $name")
    require(size >= 0, s"negative size: $size")
    val h = new Array[Byte](BLOCK)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)                                   // name[100]
    put(100, "0000644\u0000")                      // mode[8]
    put(108, "0000000\u0000")                      // uid[8]
    put(116, "0000000\u0000")                      // gid[8]
    put(124, f"$size%011o ")                       // size[12], octal
    put(136, "00000000000 ")                       // mtime[12] = epoch
    put(156, "0")                                  // typeflag = regular file
    put(257, "ustar\u000000")                      // magic[6] + version[2]
    // checksum[148..156] computed with the field as 8 spaces
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < BLOCK) { sum += (h(i) & 0xff); i += 1 }
    put(148, f"$sum%06o\u0000 ")
    h
  }

  /** Serialize entries into one tar shard (streamed append order). */
  def write(entries: Iterator[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    entries.foreach { case (name, payload) =>
      require(out.size().toLong + BLOCK + pad512(payload.length.toLong) +
          2L * BLOCK <= Int.MaxValue,
        s"tar shard would exceed 2 GiB appending '$name' — lower rowsPerShard")
      out.write(header(name, payload.length.toLong))
      out.write(payload)
      val rem = (BLOCK - payload.length % BLOCK) % BLOCK
      if (rem > 0) out.write(new Array[Byte](rem))
    }
    out.write(new Array[Byte](2 * BLOCK)) // end-of-archive marker
    out.toByteArray
  }

  /** Parse a tar shard into its members (offset = payload byte offset). */
  def parse(bytes: Array[Byte]): Seq[Entry] = {
    val out = Seq.newBuilder[Entry]
    var pos = 0L
    def zeroBlock(off: Long): Boolean = {
      var i = 0
      while (i < BLOCK) {
        if (bytes((off + i).toInt) != 0) return false
        i += 1
      }
      true
    }
    while (pos + BLOCK <= bytes.length && !zeroBlock(pos)) {
      val p = pos.toInt
      var nameEnd = p
      while (nameEnd < p + 100 && bytes(nameEnd) != 0) nameEnd += 1
      val name = new String(bytes, p, nameEnd - p, StandardCharsets.UTF_8)
      val sizeStr = new String(bytes, p + 124, 12, StandardCharsets.UTF_8)
        .takeWhile(c => c >= '0' && c <= '7')
      require(sizeStr.nonEmpty,
        s"corrupt tar header at offset $pos: non-octal size field for '$name'")
      val size = java.lang.Long.parseLong(sizeStr, 8)
      val dataOff = pos + BLOCK
      require(dataOff + size <= bytes.length,
        s"corrupt/truncated tar member '$name' at offset $pos: " +
          s"size=$size runs past shard end ${bytes.length}")
      val payload = java.util.Arrays.copyOfRange(
        bytes, dataOff.toInt, (dataOff + size).toInt)
      out += Entry(name, dataOff, size, payload)
      pos = dataOff + pad512(size)
    }
    out.result()
  }
}
