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
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.1"
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $what: ${(System.nanoTime()-t0)/1e9}%.3fs"); r
    }
    // epsPairsAnn cost split at 32k vectors (m=16 replicas)
    val embD0 = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val m = 16
    val c = (0 until m).map { i =>
      embD0.select(
        ($"vec_id" + lit(i.toLong * 10000000L)).as("vec_id"),
        transform($"embedding", (x, d) =>
          (x * when(pmod(hash(lit(i), d), lit(2)) === 0, 1.0f)
            .otherwise(-1.0f)).cast("float")).as("embedding"))
    }.reduce(_ unionAll _).localCheckpoint()
    val n = c.count()
    println(s"[scratch] n=$n")
    val cells = math.max(4L, math.min(1024L, n / 512L)).toInt
    val fitSample = time("sample take")(
      c.orderBy(md5($"vec_id".cast("string"))).limit(8192).localCheckpoint())
    val cb = time(s"kmeans fit cells=$cells on 8192 sample")(
      graft.operators.Ann.kmeans(fitSample, cells, 2))
    val routed = time("route count")(
      graft.operators.Ann.route(c, cb, 2).localCheckpoint())
    // cell population skew
    val pops = routed.groupBy($"cluster").count()
      .orderBy($"count".desc).limit(10).collect()
    println("[scratch] top cells: " + pops.map(r => r.getLong(1)).mkString(","))
    val a = routed.select($"cluster", $"vec_id".as("u"), $"embedding".as("va"))
    val bb = routed.select($"cluster", $"vec_id".as("v"), $"embedding".as("vb"))
    val edges = time("candidate join + verify + distinct")(
      a.join(bb, Seq("cluster"))
        .filter($"u" < $"v" &&
          round(graft.queries.Sim.cosine($"va", $"vb"), 4) >= 0.3)
        .select($"u", $"v").distinct().count())
    println(s"[scratch] edges=$edges")
    spark.stop()
  }
}
