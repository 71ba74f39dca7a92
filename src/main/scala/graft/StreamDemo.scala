package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{Generator, MetricsReporter, Pipelines}

/** Runnable end-to-end demo of the reference topology (StreamJob.java:29-221)
  * without external infrastructure: deterministic generator → JSON wire →
  * both pipelines as Structured Streaming queries → console + in-memory
  * sink, with the metrics listener attached.
  *
  * Usage: runMain graft.StreamDemo [nEvents]
  * (With a Kafka broker, swap MemoryStream for Sources.kafkaStream — the
  * pipeline code is identical.)
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500L)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val reporter = new MetricsReporter
    spark.streams.addListener(reporter)

    val wire = Generator.toWire(Generator.batch(spark, n)).as[String].collect()

    val mem = MemoryStream[String]
    val metricsQ = Pipelines.metricsPipeline(mem.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("metrics_out").start()
    val mem2 = MemoryStream[String]
    val riskQ = Pipelines.riskPipeline(mem2.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("risk_out").start()

    mem.addData(wire.toSeq)
    mem2.addData(wire.toSeq)
    metricsQ.processAllAvailable(); riskQ.processAllAvailable()
    // sentinel far in the future closes all real windows (append mode)
    val sentinel = """{"transactionId":"s","senderId":"s","receiverId":"r","amount":0.0,"currency":"USD","exchangeRate":1.0,"timestamp":99999999999999}"""
    mem.addData(Seq(sentinel)); metricsQ.processAllAvailable()
    mem.addData(Seq(sentinel)); metricsQ.processAllAvailable()

    val metrics = spark.table("metrics_out")
      .filter($"window_start" < 90000000000000L).orderBy("window_start")
    val risk = spark.table("risk_out")

    println(s"=== metrics windows (${metrics.count()}) ===")
    metrics.select("line").as[String].collect().take(5).foreach(println)
    println(s"=== risk lines (${risk.count()}) ===")
    risk.select("line").as[String].collect().take(5).foreach(println)
    println("=== reporter snapshot ===")
    println(reporter.snapshotJson)

    metricsQ.stop(); riskQ.stop(); spark.stop()
  }
}
