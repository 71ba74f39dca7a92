package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorDot
import graft.operators.Similarity

/** The native VectorDot expression: bit-equality with the built-ins-only
  * HOF fold, SQL registration, null/edge handling. */
class VectorDotSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private val df = (0L until 200L).map(i =>
    (i, Seq.fill(64)(rnd.nextGaussian().toFloat),
      Seq.fill(64)(rnd.nextGaussian().toFloat)))
    .toDF("id", "a", "b")
    .withColumn("a", $"a".cast("array<float>"))
    .withColumn("b", $"b".cast("array<float>"))

  test("native expression is bit-identical to the zip_with/aggregate fold") {
    val cmp = df.select(
      VectorDot.vector_dot($"a", $"b").as("native"),
      Similarity.dotSeqHof($"a", $"b").as("hof")).collect()
    assert(cmp.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("GraftExtensions-injected SQL function resolves without temp registration") {
    val df2 = Seq((Seq(2.0f, 3.0f), Seq(4.0f, 5.0f))).toDF("a", "b")
      .withColumn("a", $"a".cast("array<float>"))
      .withColumn("b", $"b".cast("array<float>"))
    df2.createOrReplaceTempView("vd_ext")
    assert(spark.sql("SELECT vector_dot(a, b) AS d FROM vd_ext")
      .head().getDouble(0) == 23.0)
  }

  test("registered SQL function works") {
    VectorDot.register(spark)
    df.createOrReplaceTempView("vd")
    val out = spark.sql(
      "SELECT id, vector_dot(a, b) AS d FROM vd ORDER BY id").collect()
    val want = df.select($"id", Similarity.dotSeqHof($"a", $"b"))
      .orderBy("id").collect()
    assert(out.map(_.getDouble(1)).toSeq == want.map(_.getDouble(1)).toSeq)
  }

  test("null inputs yield null; empty arrays yield 0") {
    val edge = Seq(
      (1L, Some(Seq(1.0f)), Some(Seq(2.0f))),
      (2L, None, Some(Seq(2.0f))),
      (3L, Some(Seq.empty[Float]), Some(Seq.empty[Float])))
      .toDF("id", "a", "b")
      .withColumn("a", $"a".cast("array<float>"))
      .withColumn("b", $"b".cast("array<float>"))
    val out = edge.select($"id", VectorDot.vector_dot($"a", $"b").as("d"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 2.0)
    assert(out(1).isNullAt(1))
    assert(out(2).getDouble(1) == 0.0)
  }

  test("double and mixed float/double arrays are bit-identical to the HOF fold") {
    // the r15 widening: the PQ/IVF hot paths fold array<double> residuals
    // and codeword arrays against float corpus vectors
    val mixed = (0L until 200L).map(i =>
      (i, Seq.fill(64)(rnd.nextGaussian().toFloat),
        Seq.fill(64)(rnd.nextGaussian())))
      .toDF("id", "f", "d")
      .withColumn("f", $"f".cast("array<float>"))
    val cmp = mixed.select(
      VectorDot.vector_dot($"f", $"d").as("n_fd"),
      Similarity.dotSeqHof($"f", $"d").as("h_fd"),
      VectorDot.vector_dot($"d", $"d").as("n_dd"),
      Similarity.dotSeqHof($"d", $"d").as("h_dd")).collect()
    assert(cmp.forall(r =>
      r.getDouble(0) == r.getDouble(1) && r.getDouble(2) == r.getDouble(3)))
  }

  test("type mismatch is an analysis error") {
    val bad = Seq((1, Seq("x", "y"))).toDF("id", "a")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(VectorDot.vector_dot($"a", $"a")).collect()
    }
  }
}
