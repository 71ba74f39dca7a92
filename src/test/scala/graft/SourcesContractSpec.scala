package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

/** Contract pins for the Kafka wrappers — the one §2 surface the sandbox
  * cannot execute (no broker, no spark-sql-kafka connector jar, so even
  * source RESOLUTION is env-blocked). What CAN be checked without a
  * broker is the exact option strings handed to the connector, against
  * the reference consumer/producer configuration:
  *
  *  - consumer: StreamJob.java:36-51 — bootstrap "kafka:9093", topic
  *    "remittance-stream", SimpleStringSchema, two independent
  *    consumers, `setStartFromLatest()` (line 56);
  *  - producer: KafkaProducerConfig.java:19-31 + the send at
  *    RemittanceGenerator.java:60-61.
  *
  * A typo in any option KEY (e.g. `kafka.bootstrap.server`) would pass a
  * compile-only check and fail at first deployment — these pins are the
  * strongest broker-free gate for that failure class. */
class SourcesContractSpec extends AnyFunSuite {

  test("consumer option map matches the reference consumer config " +
      "(topic, latest offsets, kafka.-prefixed bootstrap passthrough)") {
    val opts = Sources.kafkaConsumerOptions("kafka:9093")
    // Spark's Kafka source requires the broker list under the
    // kafka.-prefixed passthrough key — a bare "bootstrap.servers" is
    // silently ignored and the query dies at start
    assert(opts("kafka.bootstrap.servers") == "kafka:9093")
    // the reference's single shared topic (StreamJob.java:41)
    assert(opts("subscribe") == "remittance-stream")
    // setStartFromLatest() ≡ startingOffsets=latest (StreamJob.java:56)
    assert(opts("startingOffsets") == "latest")
    // Spark manages offsets in the checkpoint and forbids two queries
    // sharing a consumer group — Flink's group.id=flink-group must NOT
    // be forwarded (S1/S2 are two queries on one topic)
    assert(!opts.keys.exists(_.toLowerCase.contains("group")))
    assert(opts.size == 3, s"unexpected extra options: $opts")
  }

  test("consumer map: overrides flow through verbatim (two independent " +
      "readers differ only where told to)") {
    val a = Sources.kafkaConsumerOptions("b:1", "t1", "earliest")
    assert(a == Map("kafka.bootstrap.servers" -> "b:1",
      "subscribe" -> "t1", "startingOffsets" -> "earliest"))
    // S1/S2: same call twice yields equal maps — reader independence
    // lives in Spark's per-query groups/checkpoints, not in the config
    assert(Sources.kafkaConsumerOptions("b:1") ==
      Sources.kafkaConsumerOptions("b:1"))
  }

  test("producer option map matches the reference producer config " +
      "(topic, bootstrap passthrough, checkpointed exactly-once send)") {
    val opts = Sources.kafkaProducerOptions("kafka:9093")
    assert(opts("kafka.bootstrap.servers") == "kafka:9093")
    // the generator publishes to the same stream topic
    // (RemittanceGenerator.java:60-61)
    assert(opts("topic") == "remittance-stream")
    // the reference's KafkaTemplate.send().get() acks synchronously;
    // the structured-streaming analog of that durability is the
    // checkpointed sink commit — the option must always be present
    assert(opts("checkpointLocation").nonEmpty)
    assert(opts.size == 3, s"unexpected extra options: $opts")
  }
}
