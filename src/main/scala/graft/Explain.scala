package graft

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for every SparkEntry query — the artifact
  * for plan review (pushdown reaching scans, broadcast vs shuffle joins,
  * whole-stage codegen spans).
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.core.Sessions.local("4", utc = true)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        // queryExecution.explainString avoids stdout interleaving surprises
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => println(s"EXPLAIN FAILED: $e") }
    }
    spark.stop()
  }
}
