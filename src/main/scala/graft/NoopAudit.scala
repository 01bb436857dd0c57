package graft

import org.apache.spark.sql.SparkSession

/** Audit tool (optimization round 19 — verdict r18 #4, guide §1.4): for
  * every declared query, time the two candidate bench actions —
  * `df.count()` (the historical timed action, which lets the optimizer
  * prune computed columns and sometimes whole subtrees) and the noop
  * sink (`df.write.format("noop")`, which eagerly computes EVERY column
  * of every row). Queries whose noop cost materially exceeds their count
  * cost were under-measured by the bench (the optimizer deleted declared
  * work under count — q_cluster_silhouette's round-18 artifact was the
  * proven instance). Emits one JSON line per query and a final map to
  * bench/noop_audit.json. Environment mirrors graft.Bench: same session
  * configs, buffer pool on, warmup entry, checkpoint release and the
  * invocation fence between measurements, cheapest-first order.
  *
  * Flagged queries (noop > 1.3 × count and noop − count > 0.15 s) are
  * re-measured once to shed JIT/window noise before they are reported
  * flagged in the artifact. */
object NoopAudit {
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    GraftSession.configs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count()
    System.setProperty("graft.cacheTables", "true")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { n =>
      graft.catalog.Tables.t(spark, sfDir, n).count()
    }
    graft.catalog.Tables.events(spark, sfDir).count()

    def releaseCheckpoints(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .filter(org.apache.spark.rdd.RddIntrospect.isLocalCheckpoint)
        .foreach(_.unpersist(blocking = false))

    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        noop: Boolean): Double = {
      graft.util.Memo.newInvocation()
      val t0 = System.nanoTime()
      val ok = try {
        val df = fn(spark, sfDir)
        if (noop) df.write.format("noop").mode("overwrite").save()
        else df.count()
        true
      } catch { case _: Throwable => false }
      val t = (System.nanoTime() - t0) / 1e9
      releaseCheckpoints()
      if (ok) t else -1.0
    }

    val medians: Map[String, Double] = {
      val p = java.nio.file.Paths.get("bench", "medians.json")
      if (java.nio.file.Files.exists(p)) {
        val text = java.nio.file.Files.readString(p)
        """"([^"]+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(text)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } else Map.empty
    }
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy { case (name, _) =>
        (medians.getOrElse(name, Double.MaxValue), name)
      }

    val out = collection.mutable.ArrayBuffer.empty[(String, Double, Double, Boolean)]
    for ((name, fn) <- ordered) {
      var c = time(fn, noop = false)
      var n = time(fn, noop = true)
      var flagged = c > 0 && n > 0 && n > 1.3 * c && n - c > 0.15
      if (flagged) { // confirm: shed JIT/window noise
        val c2 = time(fn, noop = false)
        val n2 = time(fn, noop = true)
        if (c2 > 0) c = math.min(c, c2)
        if (n2 > 0) n = math.min(n, n2)
        flagged = n > 1.3 * c && n - c > 0.15
      }
      out += ((name, c, n, flagged))
      System.err.println(s"""{"q":"$name","count":${fmt(c)},"noop":${fmt(n)},"flagged":$flagged}""")
    }
    val totalC = out.map(_._2).filter(_ > 0).sum
    val totalN = out.map(_._3).filter(_ > 0).sum
    val json = out.map { case (k, c, n, f) =>
      "\"" + k + "\":{\"count\":" + fmt(c) + ",\"noop\":" + fmt(n) +
        ",\"flagged\":" + f + "}"
    }.mkString(
      s"""{"total_count":${fmt(totalC)},"total_noop":${fmt(totalN)},"sf":"$sfDir","queries":{""",
      ",", "}}")
    java.nio.file.Files.write(java.nio.file.Paths.get("bench", "noop_audit.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json.take(4000))
    spark.stop()
  }
}
