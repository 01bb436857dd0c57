package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: print the formatted physical plan of named SparkEntry
  * queries (all of them with no args) — the manual half of PlanSpec's
  * plan-audit loop. `scripts/run.sh graft.Explain q_tpch_q3 ...` */
object Explain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    GraftSession.configs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      println(s"===== $q")
      SparkEntry.queries.get(q) match {
        case None =>
          println(s"unknown query '$q' — known: " +
            SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
        case Some(fn) =>
          try println(fn(spark, sfDir)
            .queryExecution.explainString(ExplainMode.fromString("formatted")))
          catch { case scala.util.control.NonFatal(e) =>
            println(s"explain failed for $q:")
            e.printStackTrace(System.out)
          }
      }
    }
    spark.stop()
  }
}
