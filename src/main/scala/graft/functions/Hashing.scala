package graft.functions

/** Shared deterministic 64-bit hashing primitives (FNV-1a combine +
  * splitmix64 finalizer — public-domain constant sets). */
object Hashing {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** splitmix64 finalizer: full-avalanche bijection. */
  @inline def mix64(x0: Long): Long = {
    var z = x0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Seeded re-mix: the i-th pseudo-permutation of x (MinHash perms). */
  @inline def mixSeeded(x: Long, i: Int): Long =
    mix64(x ^ (i.toLong * 0x9e3779b97f4a7c15L))

  /** FNV-1a over UTF-16 chars, splitmix-finalized. */
  def stringHash(s: String): Long = {
    var h = FnvOffset
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * FnvPrime; i += 1 }
    mix64(h)
  }

  @inline def combine(h: Long, x: Long): Long = (h ^ x) * FnvPrime
}
