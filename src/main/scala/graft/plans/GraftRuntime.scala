package graft.plans

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the graft expressions. Top-level object methods
  * get static forwarders, so generated whole-stage code calls
  * `graft.plans.GraftRuntime.charHash(...)` directly — one static
  * call per row, no boxing, no interpreted fallback.
  */
object GraftRuntime {
  final val P = 1000000007L
  final val Seed = 7L

  @inline private def hashRange(s: String, from: Int, until: Int, init: Long): Long = {
    var h = init
    var i = from
    while (i < until) {
      // Advance by code point: surrogate pairs hash once, matching
      // Spark's split("")/codepoint view and the DuckDB ord() oracle.
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  def charHash(s: UTF8String): Long = {
    val str = s.toString
    hashRange(str, 0, str.length, Seed)
  }

  def shingleHashes(text: UTF8String): ArrayData = {
    val s = text.toString
    val toks = s.split(" ", -1)
    if (toks.length < 3) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](toks.length)
    var i = 0
    while (i + 2 < toks.length) {
      var h = Seed
      var k = i
      while (k <= i + 2) {
        val t = toks(k)
        h = hashRange(t, 0, t.length, h)
        if (k < i + 2) h = (h * 31 + ' '.toInt) % P
        k += 1
      }
      if (seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def minhashSignature(shingles: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val arr = shingles.toLongArray()
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.length) {
      val h = arr(i)
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Per-bit REMIX gᵢ(h) = (aᵢ·h + bᵢ) mod P with the SAME constant
    * generator as functions/GraftHash.perms (spec-pinned identical):
    * charHash values carry only ~30 bits (mod P ≈ 2³⁰), so slicing
    * raw bits past ~30 yields CONSTANT fingerprint bits — the remix
    * gives every bit an independent fair coin, which is what lets
    * the fingerprint widen to the Manku 60-bit operating point
    * (r14: the old 24-bit raw-slice form fit p = 1.69 super-linear
    * because 6-bit chunk keys block into N²/64 candidate pairs). */
  @inline private def bitPerm(j: Int): (Long, Long) = {
    val a = (j.toLong * 2654435761L + 2654435769L) % P
    val b = (j.toLong * 40503L + 17L) % P
    (if (a == 0) 1L else a, b)
  }

  def simHash(shingles: ArrayData, bits: Int): Long = {
    val arr = shingles.toLongArray()
    var sim = 0L
    var b = 0
    while (b < bits) {
      val (pa, pb) = bitPerm(b)
      var cnt = 0L
      var i = 0
      while (i < arr.length) {
        // vote +1 when the remixed value lands in the upper half of
        // [0, P) — 2g > P, identical in the DuckDB oracle fragment
        val g = (pa * arr(i) + pb) % P
        if (2L * g > P) cnt += 1L else cnt -= 1L
        i += 1
      }
      if (cnt > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    var i = 0; var j = 0; var inter = 0
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { inter += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    val union = x.length + y.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def dotProduct(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    var acc = 0.0
    var i = 0
    while (i < x.length) { acc += x(i) * y(i); i += 1 }
    acc
  }

  /** LSH band key: fold (acc*31 + c) % P over signature components.
    * Starting at 0 equals starting at the first component (0*31+c0 =
    * c0), so this matches functions/GraftHash.bandKey's reduce. */
  def bandKey(components: ArrayData): Long = {
    var acc = 0L
    var i = 0
    val n = components.numElements()
    while (i < n) { acc = (acc * 31 + components.getLong(i)) % P; i += 1 }
    acc
  }
}
