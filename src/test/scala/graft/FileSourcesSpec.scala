package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.FileSources

/** File-layout source contracts: hive-partitioned pruning (pl26) and the
  * schema-pinned JSONL source (s4) — the plan-level properties the
  * DuckDB value oracle cannot see. */
class FileSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("pl26: the scan is partition-pruned (PartitionFilters carries " +
      "the lang predicate) and row-identical to the flat-table filter") {
    val served = graft.queries.PipelineQueries
      .queries("pl26_partition_prune")(spark, dir)
    val plan = served.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("lang")),
      s"no lang partition filter in the scan:\n$plan")
    val flat = graft.core.Tables.load(spark, dir, "documents")
      .filter($"lang" === "en")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"),
        sum(graft.functions.TextFunctions.tokenCount($"text")).as("n_tokens"))
    assert(served.collect().toSet === flat.collect().toSet)
  }

  test("s4: the JSONL round trip is lossless — aggregate over the JSONL " +
      "artifact equals the same aggregate over the parquet fixture") {
    val served = graft.queries.PipelineQueries
      .queries("s4_jsonl_docs")(spark, dir)
    val flat = graft.core.Tables.load(spark, dir, "documents")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"),
        sum(graft.functions.TextFunctions.tokenCount($"text")).as("n_tokens"),
        min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
    assert(served.collect().toSet === flat.collect().toSet)
    // the timed plan must not pay a schema-inference pass: the read is
    // schema-pinned, so the analyzed schema equals the pin exactly
    assert(FileSources.readJsonl(spark,
      FileSources.jsonlDocsDir(spark, dir)).schema
      === FileSources.DocsJsonSchema)
  }

  test("s5: the ORC scan pushes the numeric predicate (PushedFilters) " +
      "and the round trip is lossless vs the parquet fixture") {
    val served = graft.queries.PipelineQueries
      .queries("s5_orc_docs")(spark, dir)
    val plan = served.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.find(_.contains("PushedFilters"))
    assert(pushed.exists(l => l.contains("n_chars") &&
      l.contains("GreaterThanOrEqual")),
      s"no pushed n_chars filter in the ORC scan:\n$plan")
    val flat = graft.core.Tables.load(spark, dir, "documents")
      .filter($"n_chars" >= 200L)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"),
        sum(graft.functions.TextFunctions.tokenCount($"text")).as("n_tokens"),
        min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
    assert(served.collect().toSet === flat.collect().toSet)
  }

  test("JSONL PERMISSIVE corrupt-record contract: malformed lines are " +
      "captured, well-formed rows survive (P1's policy, batch twin)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(tmp, "part-0.json"),
      ("""{"doc_id": 1, "text": "ok one", "lang": "en", "source": "s", "n_chars": 6}""" + "\n" +
        """{"doc_id": 2, "text": "broken""" + "\n" +
        """{"doc_id": 3, "text": "ok two", "lang": "de", "source": "s", "n_chars": 6}""" + "\n")
        .getBytes("UTF-8"))
    val schema = StructType(FileSources.DocsJsonSchema.fields :+
      StructField("_corrupt_record", StringType))
    val rows = FileSources.readJsonl(spark, tmp, schema)
      .select($"doc_id", $"_corrupt_record").collect()
    assert(rows.length == 3)
    val corrupt = rows.filter(!_.isNullAt(1))
    assert(corrupt.length == 1 &&
      corrupt.head.getString(1).contains("broken"))
    assert(rows.filter(_.isNullAt(1)).map(_.getLong(0)).toSet == Set(1L, 3L))
  }
}
