package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing: writing both sides bucketed by the join
  * key lets Spark plan a SortMergeJoin with NO shuffle exchange — the
  * pre-partitioning contract that makes repeated fact-fact joins viable at
  * 100 TB (shuffle once at write time, never again per query). */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("bucketed join plans without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    graft.core.Tables.load(spark, dir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    graft.core.Tables.load(spark, dir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    // disable broadcast so the join strategy question is real
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
      val physical = j.queryExecution.executedPlan.toString
      // the JOIN itself must not shuffle (bucket layout satisfies the
      // required distribution); only the final agg exchanges
      val joinIdx = physical.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected SortMergeJoin:\n$physical")
      val belowJoin = physical.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning"),
        s"join below should read bucketed layout without exchange:\n$physical")
      // and the result is correct
      val got = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = graft.core.Tables.load(spark, dir, "lineitem")
        .join(graft.core.Tables.load(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
