package graft
import org.apache.spark.sql.SparkSession

/** Plan inspector: print the formatted physical plan (and optionally time
  * the execution) of named SparkEntry queries — the ".explain and iterate"
  * loop as a one-liner.
  *
  * Usage: scripts/run.sh graft.Explain <sfDir> <query> [query ...]
  *        TIME=1 scripts/run.sh graft.Explain <sfDir> <query>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Explain <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    GraftSession.configs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      println(s"===== $name =====")
      val df = fn(spark, sfDir)
      df.explain("formatted")
      if (sys.env.contains("TIME")) {
        // warm once, then measure
        df.count()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[time] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
