package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Focused pin for BucketedCdf's internals after the r15 optimization
  * (the bucket id moved from an interpreted `aggregate()` higher-order
  * fold to a static sum of codegen'd comparisons): the bucketed
  * cumulative must stay byte-identical to the reference single-window
  * cumulative on histograms that exercise the edges the bucket id can
  * get wrong — duplicated values (ties must share a bucket), values
  * exactly AT probe boundaries (strict `>` semantics), heavy skew
  * (most mass on one value ⇒ collapsed probe boundaries), and the
  * global no-group case. */
class BucketedCdfSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def refCum(hist: org.apache.spark.sql.DataFrame,
                     groupCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val w = (if (groupCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(groupCols.map(col): _*))
      .orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("cum_ref", sum(col("c")).over(w))
  }

  test("bucketed cum == single-window cum on skewed/tied histograms") {
    import spark.implicits._
    // grouped: two groups; group a heavily skewed onto v=5 (collapsed
    // boundaries), values landing exactly on likely probe boundaries
    val rows = (1 to 200).map(i => ("a", 5.0, 7L)) ++
      (1 to 50).map(i => ("a", i.toDouble, 1L)) ++
      (1 to 80).map(i => ("b", (i % 9).toDouble, 2L))
    val hist = rows.toDF("g", "v", "c")
      .groupBy($"g", $"v").agg(sum($"c").as("c"))
    val got = graft.operators.BucketedCdf
      .withCum(hist, Seq("g"), "v", "c", nb = 8)
      .select($"g", $"v", $"cum")
    val want = refCum(hist, Seq("g")).select($"g", $"v",
      $"cum_ref".as("cum"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("global (no group) bucketed cum == single-window cum") {
    import spark.implicits._
    val hist = (1 to 500).map(i => ((i % 37).toDouble, (i % 5 + 1).toLong))
      .toDF("v", "c").groupBy($"v").agg(sum($"c").as("c"))
    val got = graft.operators.BucketedCdf
      .withCum(hist, Seq.empty, "v", "c", nb = 8)
      .select($"v", $"cum")
    val want = refCum(hist, Seq.empty).select($"v", $"cum_ref".as("cum"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }
}
