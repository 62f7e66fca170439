package graft

import graft.plans.GraftRuntime
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (seeded sampling) for the JVM kernels behind
  * the custom expressions. */
class RuntimePropSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private val Trials = 200

  private def asciiText(): String = {
    val n = rnd.nextInt(60)
    Seq.fill(n)(if (rnd.nextInt(5) == 0) ' ' else ('a' + rnd.nextInt(26)).toChar).mkString
  }
  private def sortedSet(): Array[Long] =
    Array.fill(rnd.nextInt(30))(rnd.nextLong(50)).distinct.sorted
  private def hashes(): Array[Long] =
    Array.fill(1 + rnd.nextInt(40))(rnd.nextLong(GraftRuntime.P))

  test("charHash is stable, in-range, and sensitive to content") {
    (1 to Trials).foreach { _ =>
      val s = asciiText()
      val h = GraftRuntime.charHash(UTF8String.fromString(s))
      assert(h >= 0 && h < GraftRuntime.P)
      assert(h == GraftRuntime.charHash(UTF8String.fromString(s)))
    }
    assert(GraftRuntime.charHash(UTF8String.fromString("abc")) !=
      GraftRuntime.charHash(UTF8String.fromString("abd")))
  }

  test("shingleHashes: distinct values, count bounded by token count") {
    (1 to Trials).foreach { _ =>
      val s = asciiText()
      val arr = GraftRuntime.shingleHashes(UTF8String.fromString(s)).toLongArray()
      assert(arr.toSet.size == arr.length)
      val nToks = s.split(" ", -1).length
      assert(arr.length <= math.max(0, nToks - 2))
    }
  }

  test("jaccardSorted is a similarity: bounded, symmetric, self-1") {
    def ad(a: Array[Long]) = new GenericArrayData(a)
    (1 to Trials).foreach { _ =>
      val x = sortedSet(); val y = sortedSet()
      val j = GraftRuntime.jaccardSorted(ad(x), ad(y))
      assert(j >= 0.0 && j <= 1.0)
      assert(j == GraftRuntime.jaccardSorted(ad(y), ad(x)))
      if (x.nonEmpty) assert(GraftRuntime.jaccardSorted(ad(x), ad(x)) == 1.0)
      if (x.isEmpty && y.isEmpty) assert(j == 0.0)
    }
  }

  test("minhash signature component j equals direct min over permuted hashes") {
    val perms = graft.functions.GraftHash.perms(8)
    val as = perms.map(_._1).toArray; val bs = perms.map(_._2).toArray
    (1 to Trials).foreach { _ =>
      val hs = hashes()
      val sig = GraftRuntime.minhashSignature(new GenericArrayData(hs), as, bs).toLongArray()
      (0 until 8).foreach { j =>
        val direct = hs.map(h => (h * as(j) + bs(j)) % GraftRuntime.P).min
        assert(sig(j) == direct)
      }
    }
  }

  test("simhash of identical sets is identical; bits within width") {
    (1 to Trials).foreach { _ =>
      val hs = hashes()
      val s1 = GraftRuntime.simHash(new GenericArrayData(hs), 24)
      val s2 = GraftRuntime.simHash(new GenericArrayData(hs.clone()), 24)
      assert(s1 == s2)
      assert(s1 >= 0 && s1 < (1L << 24))
    }
  }

  test("charHash folds one step per CODE POINT (non-BMP surrogate pairs hash once)") {
    // "a𝄞b": 𝄞 = U+1D11E (surrogate pair in UTF-16). The fold must see
    // exactly 3 codepoints, matching DuckDB's ord() oracle.
    val P = GraftRuntime.P
    var h = GraftRuntime.Seed
    Seq('a'.toLong, 0x1D11EL, 'b'.toLong).foreach(cp => h = (h * 31 + cp) % P)
    assert(GraftRuntime.charHash(UTF8String.fromString("a𝄞b")) == h)
    // a lone non-BMP char: exactly one fold step
    assert(GraftRuntime.charHash(UTF8String.fromString("𝄞")) ==
      (GraftRuntime.Seed * 31 + 0x1D11EL) % P)
  }

  test("dotProduct on equal-length inputs; mismatched lengths are rejected at the expression layer") {
    // kernel contract: only called with equal lengths (expression
    // returns NULL otherwise — asserted in PlansSpec)
    val x = Array(1.0, 2.0); val y = Array(3.0, 4.0)
    assert(GraftRuntime.dotProduct(new GenericArrayData(x), new GenericArrayData(y)) == 11.0)
  }

  test("dot product matches an explicit left fold bit-for-bit") {
    (1 to Trials).foreach { _ =>
      val x = Array.fill(8)(rnd.nextInt(201).toDouble / 10.0 - 10.0)
      val y = Array.fill(8)(rnd.nextInt(201).toDouble / 10.0 - 10.0)
      val got = GraftRuntime.dotProduct(new GenericArrayData(x), new GenericArrayData(y))
      var ref = 0.0
      (0 until 8).foreach(i => ref += x(i) * y(i))
      assert(got == ref)
    }
  }

  test("bandKey kernel equals the column-side reduce formula bit-for-bit") {
    (1 to Trials).foreach { _ =>
      val comps = Array.fill(1 + rnd.nextInt(8))(rnd.nextLong(GraftRuntime.P))
      val got = GraftRuntime.bandKey(new GenericArrayData(comps))
      // functions/GraftHash.bandKey: reduce((acc, c) => (acc*31 + c) % P)
      // seeded at the first component — identical to folding from 0
      val ref = comps.reduce((acc, c) => (acc * 31 + c) % GraftRuntime.P)
      assert(got == ref)
      assert(got >= 0 && got < GraftRuntime.P)
    }
  }

  test("coalesceSpans: incremental micro-batched merge equals one-shot batch sessionization") {
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.{GapMicros, SessionSpan}
    // batch truth: sort all event times, split where the gap exceeds GapMicros
    def batchSessions(ts: Seq[Long]): Seq[SessionSpan] =
      ts.sorted.foldLeft(List.empty[SessionSpan]) {
        case (head :: tail, t) if t <= head.last + GapMicros =>
          SessionSpan(head.start, math.max(head.last, t), head.n + 1) :: tail
        case (acc, t) => SessionSpan(t, t, 1) :: acc
      }.reverse
    (1 to Trials).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      // cluster times so some land within the gap and some beyond it
      val ts = Seq.fill(n)(rnd.nextLong(GapMicros * 8))
      // replay in arbitrary arrival order, split into arbitrary batches,
      // coalescing incrementally exactly as the sessionizer state does
      val shuffled = rnd.shuffle(ts)
      var state = Seq.empty[SessionSpan]
      var i = 0
      while (i < shuffled.length) {
        val take = 1 + rnd.nextInt(shuffled.length - i)
        val batch = shuffled.slice(i, i + take).map(t => SessionSpan(t, t, 1))
        state = StreamingOps.coalesceSpans(state ++ batch)
        i += take
      }
      assert(state == batchSessions(ts),
        s"incremental=$state batch=${batchSessions(ts)} ts=$ts")
    }
  }
}
