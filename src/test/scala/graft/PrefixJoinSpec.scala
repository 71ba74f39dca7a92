package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.PrefixJoin

/** PPJoin prefix-filtering all-pairs join: the selling point over LSH is
  * EXACTNESS — the result must equal the brute-force Jaccard join, with
  * no false negatives from the prefix pruning and none from the integer
  * length/threshold gates.
  */
class PrefixJoinSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def brute(df: org.apache.spark.sql.DataFrame, tNum: Int,
                    tDen: Int): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val tok = df.select($"id", explode(array_distinct(
      split($"text", "\\s+"))).as("tk"))
    val pairs = tok.as("x").join(tok.as("y"),
        col("x.tk") === col("y.tk") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("common"))
    val sz = tok.groupBy($"id").agg(count(lit(1)).as("n"))
    pairs.join(sz.select($"id".as("a"), $"n".as("na")), "a")
      .join(sz.select($"id".as("b"), $"n".as("nb")), "b")
      .filter($"common" * (tNum + tDen) >= ($"na" + $"nb") * tNum)
      .select($"a", $"b", $"common")
      .as[(Long, Long, Long)].collect().toSet
  }

  private def ppjoin(df: org.apache.spark.sql.DataFrame, tNum: Int,
                     tDen: Int): Set[(Long, Long, Long)] = {
    import spark.implicits._
    PrefixJoin.jaccardJoin(df, "id", "text", tNum, tDen)
      .select($"a", $"b", $"common").as[(Long, Long, Long)].collect().toSet
  }

  test("exactly equals brute force on a hand-built corpus (t = 1/2)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),           // J(1,2) = 3/5 ≥ 1/2
      (2L, "a b c e"),
      (3L, "a b c d"),           // exact dup of 1
      (4L, "x y z"),             // J(4,5) = 2/4 = 1/2 (boundary: kept)
      (5L, "x y w"),
      (6L, "p q"),               // J(6,7) = 1/3 < 1/2 (dropped)
      (7L, "p r"),
      (8L, "solo tokens only here")).toDF("id", "text")
    val got = ppjoin(docs, 1, 2)
    assert(got == brute(docs, 1, 2))
    assert(got.contains((1L, 2L, 3L)) && got.contains((1L, 3L, 4L)) &&
      got.contains((4L, 5L, 2L)))
    assert(!got.exists(p => p._1 == 6L || p._2 == 7L && p._1 == 6L))
  }

  test("no false negatives vs brute force on a random corpus, two thresholds") {
    import spark.implicits._
    // deterministic pseudo-random corpus: overlapping token windows
    val vocab = (0 until 40).map(i => s"t$i")
    val docs = (0L until 60L).map { i =>
      val start = (i * 7 % 40).toInt
      val len = 5 + (i % 9).toInt
      (i, (0 until len).map(j => vocab((start + j) % 40)).mkString(" "))
    }.toDF("id", "text")
    for ((tn, td) <- Seq((1, 2), (4, 5)))
      assert(ppjoin(docs, tn, td) == brute(docs, tn, td),
        s"mismatch at threshold $tn/$td")
  }

  test("ties and single-token sets survive the integer gates") {
    import spark.implicits._
    val docs = Seq(
      (1L, "only"), (2L, "only"),      // J = 1 on singleton sets
      (3L, "a"), (4L, "b")).toDF("id", "text")
    val got = ppjoin(docs, 1, 1) // threshold 1.0: exact duplicates only
    assert(got == Set((1L, 2L, 1L)))
  }
}
