package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.functions._

/** Source/sink wrappers for the reference's I/O surface (SURVEY.md §2.1,
  * §2.5). Thin by design: fixtures don't need a broker, so these are the
  * only components not exercised by the oracle gate — their logic is
  * limited to option plumbing, and the transforms they feed are the
  * batch-verified combinators.
  */
object Sources {

  /** S1/S2 — Kafka source (StreamJob.java:36-51). Each call is an
    * independent reader with its own offsets, mirroring the reference's two
    * consumers on one topic. */
  def kafkaStream(spark: SparkSession, bootstrap: String,
                  topic: String = "remittance-stream",
                  startingOffsets: String = "latest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(col("value").cast("string").as("value"))

  /** K3 — Kafka sink (producer side, RemittanceGenerator.java:60-61). */
  def kafkaSink(df: DataFrame, bootstrap: String,
                topic: String = "remittance-stream",
                checkpoint: String = "/tmp/graft-ckpt-kafka"): DataStreamWriter[_] =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** K2 — JDBC sink config, env-var contract of the reference
    * (StreamJob.java:177-179). */
  case class JdbcConfig(url: String, user: String, password: String,
                        table: String = "remittance_metrics")

  object JdbcConfig {
    /** Same env vars + defaults as StreamJob.java:177-179. */
    def fromEnv(env: Map[String, String] = sys.env): JdbcConfig = JdbcConfig(
      url = env.getOrElse("METRICS_DB_URL",
        "jdbc:postgresql://localhost:5432/postgres"),
      user = env.getOrElse("METRICS_DB_USER", "postgres"),
      password = env.getOrElse("METRICS_DB_PASSWORD", "postgres"))
  }

  /** K2 — streaming JDBC sink via foreachBatch (Structured Streaming has no
    * built-in one). Unlike the reference (batch size 1, no checkpointing —
    * at-least-once with per-row inserts), this batches per micro-batch and
    * is restartable from the checkpoint; dedupe on window_start downstream
    * makes it effectively idempotent (SURVEY.md §7 phase 4). */
  def jdbcSink(df: DataFrame, cfg: JdbcConfig,
               checkpoint: String): DataStreamWriter[_] = {
    val props = new java.util.Properties()
    props.setProperty("user", cfg.user)
    props.setProperty("password", cfg.password)
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").jdbc(cfg.url, cfg.table, props)
      }
  }

  /** K1 — console sink (StreamJob.java:90, :218). */
  def consoleSink(df: DataFrame): DataStreamWriter[_] =
    df.writeStream.format("console").option("truncate", value = false)

  /** Start helper: name + start + return the query. */
  def start(w: DataStreamWriter[_], name: String): StreamingQuery =
    w.queryName(name).start()
}
