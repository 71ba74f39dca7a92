package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PortableHash
import graft.operators.BloomJoin

class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val M = 4096
  private val K = 3

  /** Scalar reference: the bit positions the distributed build must set. */
  private def refBits(key: String): Seq[Long] =
    (0 until K).map(j =>
      PortableHash.hash60Java(s"bf$j:$key".getBytes("UTF-8")) % M)

  test("mask words match a scalar reference bit-for-bit") {
    val keys = (1 to 200).map(i => s"k$i")
    val mask = BloomJoin.buildMask(keys.toDF("bkey"), col("bkey"), M, K)
    val ref = new Array[Long](M / 64)
    keys.flatMap(refBits).foreach(p =>
      ref((p >> 6).toInt) |= (1L << (p & 63).toInt))
    assert(mask.toSeq == ref.toSeq)
  }

  test("no false negatives; disjoint probes mostly rejected") {
    val keys = (1 to 200).map(i => s"k$i")
    val mask = BloomJoin.buildMask(keys.toDF("bkey"), col("bkey"), M, K)
    val members = keys.toDF("key")
      .filter(BloomJoin.mightContain(mask, col("key"), M, K)).count()
    assert(members == 200, "Bloom filter must never reject a member")
    // 600 set bits in 4096 ⇒ fpp ≈ (600/4096)^3 ≈ 0.3%; 2000 disjoint
    // probes should see a handful of positives, far under 5%.
    val fps = (1 to 2000).map(i => s"other$i").toDF("key")
      .filter(BloomJoin.mightContain(mask, col("key"), M, K)).count()
    assert(fps < 100, s"false-positive count implausibly high: $fps")
  }

  test("empty build side rejects everything") {
    val mask = BloomJoin.buildMask(
      Seq.empty[String].toDF("bkey"), col("bkey"), M, K)
    assert(mask.forall(_ == 0L))
    val n = Seq("a", "b").toDF("key")
      .filter(BloomJoin.mightContain(mask, col("key"), M, K)).count()
    assert(n == 0)
  }
}
