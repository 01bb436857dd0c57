package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (optimization round): ad-hoc timing of operator frames
  * under the bench pool — the count-vs-checkpoint measurement that
  * exposed the silhouette TVF cost (OPTIMIZATION_r18.md §3) was taken
  * here. Edit the body freely; nothing depends on it. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    GraftSession.configs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("graft.cacheTables", "true")
    val dir = "/root/testdata/sf0.1"
    graft.catalog.Tables.t(spark, dir, "part").count()
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $what: ${(System.nanoTime()-t0)/1e9}%.3fs"); r
    }
    // warm codebook memo
    time("kmeansFrame warm")(graft.operators.Ann.kmeansFrame(spark, dir, 8, 3).count())
    time("kmeansFrame again")(graft.operators.Ann.kmeansFrame(spark, dir, 8, 3).count())
    time("kmeansFrame + localCheckpoint")(
      graft.operators.Ann.kmeansFrame(spark, dir, 8, 3).localCheckpoint().count())
    time("silhouetteFrame")(graft.operators.Ann.silhouetteFrame(spark, dir).count())
    time("silhouetteFrame + localCheckpoint")(
      graft.operators.Ann.silhouetteFrame(spark, dir).localCheckpoint().count())
    spark.stop()
  }
}
