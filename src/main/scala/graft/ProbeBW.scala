package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Scratch phase probe for betweennessWeightedBounded — not part of the
  * library surface; deleted after the round-18 perf work. */
object ProbeBW {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    GraftSession.configs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("graft.cacheTables", "true")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    import graft.operators.Graph
    def t[A](what: String)(f: => A): A = {
      jobs.set(0)
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $what%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s jobs=${jobs.get}")
      r
    }
    val edges = Graph.sliceEdgesWeighted(spark, dir)
    System.err.println("edges=" + edges.count())
    val sources = edges.select(col("src").as("s")).distinct().filter(col("s") % 107 === 0)
    System.err.println("S=" + sources.count())

    // pin-lite variant: lazy checkpoint ONLY at phase boundaries
    def bwLite(rounds: Int): DataFrame = {
      val pinned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      def pin(df: DataFrame): DataFrame = { val c = df.localCheckpoint(false); pinned += c; c }
      def st(df: DataFrame): DataFrame = broadcast(df)
      val ed = pin(edges.select(col("src"), col("dst"), col("w")).repartition(col("src")))
      var dist = sources.select(col("s"), col("s").as("v"), lit(0L).as("d"))
      for (_ <- 1 to rounds) {
        val cand = st(dist).join(ed, col("v") === col("src"))
          .select(col("s"), col("dst").as("v"), (col("d") + col("w")).as("d"))
        dist = dist.unionByName(cand)
          .groupBy(col("s"), col("v")).agg(min(col("d")).as("d"))
      }
      dist = pin(dist)
      val dag = pin(ed
        .join(st(dist.select(col("s"), col("v").as("src"), col("d").as("du"))), Seq("src"))
        .join(st(dist.select(col("s"), col("v").as("dst"), col("d").as("dv"))), Seq("s", "dst"))
        .filter(col("du") + col("w") === col("dv"))
        .select(col("s"), col("src").as("u"), col("dst").as("v")))
      var dep = sources.select(col("s"), col("s").as("v"), lit(0L).as("dep"))
      for (_ <- 1 to rounds) {
        dep = dep.unionByName(
            st(dep.select(col("s"), col("v").as("u"), col("dep")))
              .join(dag, Seq("s", "u"))
              .select(col("s"), col("v"), (col("dep") + lit(1L)).as("dep")))
          .groupBy(col("s"), col("v")).agg(max(col("dep")).as("dep"))
      }
      dep = pin(dep)
      var sig = sources.select(col("s"), col("s").as("v"), lit(1L).as("sigma"))
      for (t <- 1 to rounds) {
        val add = st(sig.select(col("s"), col("v").as("u"), col("sigma")))
          .join(dag, Seq("s", "u"))
          .join(st(dep.filter(col("dep") === t).select(col("s"), col("v"))), Seq("s", "v"))
          .groupBy(col("s"), col("v")).agg(sum(col("sigma")).as("sigma"))
        sig = sig.unionByName(add)
      }
      sig = pin(sig)
      var del = dep.filter(col("dep") === rounds)
        .select(col("s"), col("v"), lit(0L).as("delta"))
      for (t <- (rounds - 1) to 1 by -1) {
        val atT = dep.filter(col("dep") === t).select(col("s"), col("v"))
        val contrib = st(atT.join(st(sig), Seq("s", "v")))
          .join(dag.select(col("s"), col("u").as("v"), col("v").as("w2")), Seq("s", "v"))
          .join(st(del.select(col("s"), col("v").as("w2"), col("delta").as("dw"))), Seq("s", "w2"))
          .join(st(sig.select(col("s"), col("v").as("w2"), col("sigma").as("sw"))), Seq("s", "w2"))
          .select(col("s"), col("v"), expr("(sigma * (10000L + dw)) div sw").as("c"))
          .groupBy(col("s"), col("v")).agg(sum(col("c")).as("delta"))
        val full = pin(atT.join(st(contrib), Seq("s", "v"), "left")
          .select(col("s"), col("v"), coalesce(col("delta"), lit(0L)).as("delta")))
        del = del.unionByName(full)
      }
      val out = del.groupBy(col("v").as("node")).agg(sum(col("delta")).as("b_e4"))
        .localCheckpoint()
      pinned.foreach(graft.util.Frames.releaseCheckpoint)
      out
    }
    for (pass <- 1 to 4) {
      val out = t(s"pass $pass lite")(
        bwLite(3).orderBy(col("b_e4").desc, col("node")).limit(20).collect())
      if (pass == 1) System.err.println("  top=" + out.take(3).mkString(","))
    }
    for (pass <- 1 to 2) {
      val out = t(s"pass $pass current")(
        Graph.betweennessWeightedBounded(edges, sources, 3)
          .orderBy(col("b_e4").desc, col("node")).limit(20).collect())
      if (pass == 1) System.err.println("  top=" + out.take(3).mkString(","))
    }
  }
}
