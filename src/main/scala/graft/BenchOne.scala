package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time individual SparkEntry queries (3 runs each) against
  * SPARK_GRAFT_SF_DIR. `runMain graft.BenchOne q1_pricing_summary dd1_...`
  * Not part of the driver contract — iteration tool only. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)
    graft.core.Tables.names.foreach { t =>
      try graft.core.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BENCHONE $name%-28s ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
