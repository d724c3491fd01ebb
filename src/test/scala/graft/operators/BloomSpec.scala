package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BloomSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val members = (1 to 300).map(i => s"doc text number $i")
  private val mBits = 32 * 512 // 16384

  test("bloomProbe: no false negatives — every built key hits") {
    val words = Bloom.bloomWords(members.toDF("k"), "k", mBits)
    val probed = Bloom.bloomProbe(members.toDF("k"), "k", words, mBits)
    assert(probed.where($"bloom_hit" === 0L).count() == 0L)
  }

  test("bloomWords: bounded, deterministic under repartition") {
    val a = Bloom.bloomWords(members.toDF("k"), "k", mBits)
      .as[(Long, Long)].collect().toMap
    val b = Bloom.bloomWords(members.toDF("k").repartition(13), "k", mBits)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.size <= mBits / 32)
    assert(a.keys.forall(i => i >= 0 && i < mBits / 32))
  }

  test("bloomProbe: non-members mostly miss; false positives are deterministic") {
    val words = Bloom.bloomWords(members.toDF("k"), "k", mBits)
    val fresh = (1 to 300).map(i => s"unseen text $i").toDF("k")
    val hits1 = Bloom.bloomProbe(fresh, "k", words, mBits)
      .where($"bloom_hit" === 1L).as[(String, Long)].collect().toSet
    // 600 bits set of 16384 → per-probe hit ~3.7%, two probes ~0.13%:
    // expect ~0-3 false positives out of 300
    assert(hits1.size <= 10)
    val hits2 = Bloom.bloomProbe(fresh.repartition(7), "k", words, mBits)
      .where($"bloom_hit" === 1L).as[(String, Long)].collect().toSet
    assert(hits1 == hits2) // the SAME keys collide, every run
  }

  test("bloomProbe: null keys and absent words miss; salt redraws the filter") {
    val words = Bloom.bloomWords(members.toDF("k"), "k", mBits)
    val probed = Bloom.bloomProbe(
      Seq[Option[String]](None, Some(members.head)).toDF("k"), "k", words, mBits)
      .as[(Option[String], Long)].collect().toMap
    assert(probed(None) == 0L && probed(Some(members.head)) == 1L)
    // a different salt must not claim membership built under another
    val other = Bloom.bloomProbe(
      members.take(50).toDF("k"), "k", words, mBits, salt = "other")
    assert(other.where($"bloom_hit" === 1L).count() < 10L)
  }

  test("mergeWords: shard union equals the from-scratch build exactly") {
    val (a, b) = members.splitAt(120)
    val overlap = members.slice(100, 140) // shards may overlap
    val shards = Bloom.bloomWords(a.toDF("k"), "k", mBits)
      .unionByName(Bloom.bloomWords(b.toDF("k"), "k", mBits))
      .unionByName(Bloom.bloomWords(overlap.toDF("k"), "k", mBits))
    val merged = Bloom.mergeWords(shards).as[(Long, Long)].collect().toMap
    val direct = Bloom.bloomWords(members.toDF("k"), "k", mBits)
      .as[(Long, Long)].collect().toMap
    assert(merged == direct)
  }

  test("bloomProbeSharded: equals the broadcast probe bit for bit at any shared mBits") {
    val words = Bloom.bloomWords(members.toDF("k"), "k", mBits)
    val mixed = (members.take(80) ++ (1 to 80).map(i => s"unseen text $i")).toDF("k")
    val bc = Bloom.bloomProbe(mixed, "k", words, mBits)
      .as[(String, Long)].collect().toMap
    val sh = Bloom.bloomProbeSharded(mixed, "k", words, mBits.toLong)
      .as[(String, Long)].collect().toMap
    assert(sh == bc)
  }

  test("bloomProbeSharded: past the broadcast bound — no false negatives, null misses") {
    val big = (1L << 31) // rejected by bloomProbe, accepted sharded
    val words = Bloom.bloomWordsLarge(members.toDF("k"), "k", big)
    intercept[IllegalArgumentException](
      Bloom.bloomProbe(members.toDF("k"), "k", words, mBits = Int.MaxValue - 31))
    val probed = Bloom.bloomProbeSharded(
      (members.take(40).map(Option(_)) :+ Option.empty[String]).toDF("k"), "k", words, big)
      .as[(Option[String], Long)].collect().toMap
    assert(probed(None) == 0L)
    assert(members.take(40).forall(k => probed(Some(k)) == 1L))
    // a fresh key set against a 2^31-bit filter: collisions ~0
    val fresh = Bloom.bloomProbeSharded(
      (1 to 200).map(i => s"unseen text $i").toDF("k"), "k", words, big)
    assert(fresh.where($"bloom_hit" === 1L).count() == 0L)
  }

  test("bloomWordsLarge: sharded builds merge to the flat build at large mBits") {
    val big = (1L << 31)
    val (a, b) = members.splitAt(150)
    val merged = Bloom.mergeWords(
      Bloom.bloomWordsLarge(a.toDF("k"), "k", big)
        .unionByName(Bloom.bloomWordsLarge(b.toDF("k"), "k", big)))
      .as[(Long, Long)].collect().toMap
    val direct = Bloom.bloomWordsLarge(members.toDF("k"), "k", big)
      .as[(Long, Long)].collect().toMap
    assert(merged == direct)
  }

  test("contract guards: word width, broadcast bound, reserved columns") {
    intercept[IllegalArgumentException](
      Bloom.bloomWords(members.toDF("k"), "k", mBits = 100))
    intercept[IllegalArgumentException](
      Bloom.bloomWords(members.toDF("k"), "k", mBits = (1 << 30) + 32))
    val words = Bloom.bloomWords(members.toDF("k"), "k", mBits)
    intercept[IllegalArgumentException](
      Bloom.bloomProbe(members.toDF("k").withColumn("_p1", $"k"), "k", words, mBits))
    intercept[IllegalArgumentException](
      Bloom.bloomProbe(
        members.toDF("k").withColumn("bloom_hit", $"k"), "k", words, mBits))
  }
}
