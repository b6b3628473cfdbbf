package graft.util

/** Shared stable hashing (FNV-1a 64-bit, public-domain constants) — the ONE
  * implementation used by the text kernels, SimHash, multimodal stubs, and
  * AI checksum paths, so the hash contract can never desynchronize between
  * scalar and batched variants. */
object Hashing {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  def fnv1a64(s: String): Long = {
    var h = FnvOffset
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= FnvPrime; i += 1 }
    h
  }

  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    }
    h
  }
}
