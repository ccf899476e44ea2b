package graft.store

import java.util.Base64

/** Fixed-shape bloom filter over integral keys for manifest-level file
  * skipping in [[VersionedTable]] — the piece min/max range stats can't
  * provide: two files whose key RANGES fully overlap (hash-distributed or
  * interleaved keys, the normal case for surrogate ids) are
  * indistinguishable to range pruning, but their key SETS are disjoint and
  * a per-file bloom proves non-membership for almost every probe.
  *
  * Shape: `m` bits (power of two), 6 probe bits per key via double hashing
  * (splitmix64 finalizer — a public-domain mixer; no dependency, identical
  * bits on driver and executors). At the build target of ~10 bits/key the
  * false-positive rate is ≈1.6%; a false positive only costs reading one
  * extra file, never correctness. Serialized as `"<m>:<base64 words>"`
  * inside the manifest JSON — bounded (≤16 KiB of bits per file per
  * column) because the MANIFEST must stay a small, driver-readable object;
  * files with more keys than the cap can absorb simply carry no bloom and
  * stay conservatively unprunable (range stats still apply). At 100 TB the
  * same layout holds: blooms describe FILES (bounded row groups after
  * OPTIMIZE), not the table.
  */
object KeyBloom {

  val NumHashes = 6
  private val MinBits = 1 << 9   // 512 bits
  private val MaxBits = 1 << 17  // 16 KiB of bits
  private val BitsPerKey = 10L

  /** Bloom size for a file of `rows` keys, or -1 when the cap can't hold
    * the target bits/key budget (bloom would saturate — skip it).
    */
  def bitsFor(rows: Long): Int = {
    val want = rows * BitsPerKey
    if (want > MaxBits) -1
    else {
      var m = MinBits
      while (m < want) m <<= 1
      m
    }
  }

  /** Key derivation for STRING bloom columns: top 60 bits of md5 — the
    * same value as the engine's portable `conv(substr(md5(s),1,15),16,10)`
    * construction, computed identically on driver (point lookups) and
    * executors (bloom builds). Strings hash to a key; the bloom machinery
    * below is unchanged.
    */
  def stringKey(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d).getLong >>> 4
  }

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Set the key's probe bits in `words` (an m/64-long array), in place;
    * returns `words` so it threads through fold/aggregate.
    */
  def add(words: Array[Long], m: Int, key: Long): Array[Long] = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < NumHashes) {
      val bit = ((h1 + i * h2) & (m - 1)).toInt
      words(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
    words
  }

  /** Bitwise-OR merge (in place into `a`). */
  def or(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  def encode(m: Int, words: Array[Long]): String = {
    val bytes = java.nio.ByteBuffer.allocate(words.length * 8)
    words.foreach(bytes.putLong)
    s"$m:${Base64.getEncoder.encodeToString(bytes.array())}"
  }

  /** Membership probe against an encoded bloom. Never false-negative. */
  def mightContain(encoded: String, key: Long): Boolean = {
    val sep = encoded.indexOf(':')
    val m = encoded.substring(0, sep).toInt
    val bytes = Base64.getDecoder.decode(encoded.substring(sep + 1))
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < NumHashes) {
      val bit = ((h1 + i * h2) & (m - 1)).toInt
      if ((bb.getLong((bit >>> 6) * 8) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
