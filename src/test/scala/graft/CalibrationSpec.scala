package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Calibration

/** Platt scaling: parameter recovery on a known logistic relationship,
  * probability sanity, and monotonicity. */
class CalibrationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("recovers a planted logistic relationship; p_cal monotone in [0,1]") {
    // P(y=1 | m) = σ(0.8·m − 0.4) exactly, 10k samples per margin value
    val (aTrue, bTrue) = (0.8, -0.4)
    val hist = (-6 to 6).map { m =>
      val p = 1.0 / (1.0 + math.exp(-(aTrue * m + bTrue)))
      (m.toLong, 10000L, math.round(10000 * p))
    }.toDF("m", "n", "k")
    val rows = Calibration.plattCalibrate(hist, "m", "n", "k", iters = 3)
      .collect().sortBy(_.getAs[Long]("m"))
    val (a, b) = (rows.head.getAs[Double]("a"), rows.head.getAs[Double]("b"))
    assert(math.abs(a - aTrue) < 0.05, s"a=$a")
    assert(math.abs(b - bTrue) < 0.05, s"b=$b")
    val ps = rows.map(_.getAs[Double]("p_cal"))
    assert(ps.forall(p => p > 0.0 && p < 1.0))
    assert(ps.sliding(2).forall(w => w(0) <= w(1)), s"${ps.toSeq}")
  }

  test("degenerate-free on one-sided labels (clamped z keeps exp finite)") {
    // all-negative labels push b toward −∞; the clamp and fixed
    // iteration count must keep every number finite
    val hist = (-3 to 3).map(m => (m.toLong, 100L, 0L)).toDF("m", "n", "k")
    val rows = Calibration.plattCalibrate(hist, "m", "n", "k", iters = 3)
      .collect()
    rows.foreach { r =>
      assert(!r.getAs[Double]("p_cal").isNaN &&
        !r.getAs[Double]("a").isNaN && !r.getAs[Double]("b").isNaN)
      assert(r.getAs[Double]("p_cal") < 0.5)
    }
  }
}
