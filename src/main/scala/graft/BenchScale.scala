package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-slope probe (dev tool, not part of the driver contract): builds a
  * K×-replicated copy of the heaviest fixtures with key remapping — so
  * joins/groups keep realistic cardinality ratios instead of key-collision
  * blowups — and times the heaviest queries at 1× and K×. A ≲linear
  * wall-time slope is the empirical check on SURVEY.md §9's partitioning
  * contract ("would this plan survive a 100× scale-up?").
  *
  * Replication details:
  *  - orders/lineitem: orderkey → orderkey·K + r on BOTH sides, so the
  *    fact-fact join stays 1:N with K× keys (not K²× rows per key);
  *  - embeddings: vec_id remapped AND the vector rotated by r positions —
  *    norm-preserving, decorrelating, so the K× corpus has no artificial
  *    near-duplicates to quadratically inflate sim5's candidate set.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.BenchScale [K]
  */
object BenchScale {

  private val Probes = Seq("q25_percentiles", "q26_salted_join",
    "q31_multiset_ops", "q33_moment_stats", "sim5_ann_lsh")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val outDir = s"/tmp/graft-scale-${k}x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.Tables

    def rep(df: DataFrame): DataFrame =
      df.withColumn("_r", explode(sequence(lit(0L), lit(k - 1L))))

    rep(Tables.load(spark, sfDir, "lineitem"))
      .withColumn("l_orderkey", col("l_orderkey") * k + col("_r"))
      .drop("_r")
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    rep(Tables.load(spark, sfDir, "orders"))
      .withColumn("o_orderkey", col("o_orderkey") * k + col("_r"))
      .drop("_r")
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    val dims = 64
    rep(Tables.load(spark, sfDir, "embeddings"))
      .withColumn("vec_id", col("vec_id") * k + col("_r"))
      .withColumn("_rot", (col("_r") % dims).cast("int"))
      .withColumn("embedding",
        concat(slice(col("embedding"), col("_rot") + 1, lit(dims) - col("_rot")),
          slice(col("embedding"), lit(1), col("_rot"))))
      .drop("_r", "_rot")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    def timeQ(name: String, dir: String): Double = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      times.min
    }

    println(f"${"query"}%-18s ${"1x_sec"}%8s ${k + "x_sec"}%8s ${"slope"}%7s")
    Probes.foreach { q =>
      val t1 = timeQ(q, sfDir)
      val tk = timeQ(q, outDir)
      println(f"$q%-18s $t1%8.3f $tk%8.3f ${tk / t1}%7.2f")
    }
    spark.stop()
  }
}
