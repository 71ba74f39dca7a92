package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Schemas.RemittanceTransaction
import graft.functions.MetricAggregator
import graft.operators.WindowMetrics
import graft.streaming.Generator

/** Extension-point surfaces: typed Aggregator (UDAF), scala UDF registry,
  * and their agreement with the expression-based operators. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("typed MetricAggregator agrees with expression-based WindowMetrics") {
    val g = Generator.batch(spark, 1000)
    val typed = g.as[RemittanceTransaction]
      .groupByKey(t => t.timestamp / 10000L)
      .agg(MetricAggregator.toColumn.name("m"))
      .collect().map { case (w, m) => w * 10000L -> m }.toMap
    val expr = WindowMetrics.tumbling(
      g.withColumn("ts", timestamp_millis($"timestamp")),
      $"ts", $"exchangeRate" =!= 0.0, $"amount", $"exchangeRate",
      "10 seconds").collect()
      .map(r => r.getAs[Long]("window_start") -> r).toMap
    assert(typed.keySet == expr.keySet)
    typed.foreach { case (w, m) =>
      val e = expr(w)
      assert(m.cnt == e.getAs[Long]("cnt"))
      assert(m.successCount == e.getAs[Long]("success_cnt"))
      assert(m.failureCount == e.getAs[Long]("failure_cnt"))
      // typed path sums in plain double (merge-order dependent) vs the
      // decimal-exact expression path — agreement is to fp tolerance
      assert(math.abs(m.avgAmount - e.getAs[Double]("avg_amount")) < 1e-6)
      assert(m.minAmount == e.getAs[Double]("min_amount"))
      assert(m.maxAmount == e.getAs[Double]("max_amount"))
    }
  }

  test("scala UDF registry surface") {
    spark.udf.register("risk_label_udf",
      (amount: Double) => if (amount > 1000.0) "RISK" else "SAFE")
    val out = spark.sql("SELECT risk_label_udf(1500.0) AS r").head().getString(0)
    assert(out == "RISK")
  }

  test("streaming dropDuplicatesWithinWatermark dedups the wire stream") {
    implicit val sc = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val wire = Generator.toWire(Generator.batch(spark, 50)).as[String].collect()
    val parsed = graft.functions.JsonCodec
      .parseTransactions(mem.toDF(), $"value")
      .filter(!$"_corrupt")
      .withColumn("event_time", timestamp_millis($"timestamp"))
      .withWatermark("event_time", "10 seconds")
      .dropDuplicatesWithinWatermark("transactionId")
    val q = parsed.writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream").start()
    try {
      mem.addData(wire.toSeq ++ wire.take(10).toSeq) // re-deliver 10 dups
      q.processAllAvailable()
    } finally q.stop()
    val n = spark.table("dedup_stream").count()
    assert(n == 50L) // duplicates within the watermark horizon removed
  }
}
