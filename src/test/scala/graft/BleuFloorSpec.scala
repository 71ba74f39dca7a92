package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** tx26's candidate floor is semantics-bearing (VERDICT r8 #6): pin that
  * it only ever DROPS pairs — floor=0 output is a superset of the
  * floored output, and the shared pairs carry IDENTICAL columns — so a
  * future tuning change cannot silently alter true overlaps. */
class BleuFloorSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def keyed(rows: Array[Row]): Map[(Long, Long), Row] =
    rows.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap

  test("floor=0 output ⊇ floored output, identical rows on shared pairs") {
    val floored = keyed(
      graft.queries.TextQueries.bleuOverlap(spark, dir, 0.02).collect())
    val unfloored = keyed(
      graft.queries.TextQueries.bleuOverlap(spark, dir, 0.0).collect())
    assert(floored.nonEmpty, "fixture must surface at least one candidate")
    assert(unfloored.size >= floored.size)
    floored.foreach { case (k, r) =>
      val u = unfloored.get(k)
      assert(u.isDefined, s"pair $k dropped by floor=0")
      assert(u.get == r, s"pair $k differs between floors:\n ${u.get}\n $r")
    }
  }
}
