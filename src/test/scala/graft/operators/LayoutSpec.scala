package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** Layout operators: bucketed co-located joins must elide the shuffle;
  * salted joins must be result-identical to plain joins. */
class LayoutSpec extends SparkSpec {

  test("bucketed join: no Exchange on either side (co-located sort-merge)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Layout.writeBucketed(
        Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice"),
        "orders_b", "o_orderkey", 4)
      Layout.writeBucketed(
        Tables.lineitem(spark, sf()).select("l_orderkey", "l_quantity"),
        "lineitem_b", "l_orderkey", 4)
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // and it computes the right thing
      assert(joined.count() ===
        Tables.lineitem(spark, sf()).join(Tables.orders(spark, sf()),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("bucketed MERGE + CDC diff: zero exchanges when both versions share the layout") {
    // SURVEY §2B pins this claim for q_merge_upsert and q_cdc_diff: the
    // full-outer key join is the whole plan, so when both snapshots carry
    // the bucketed layout the merge/diff runs with NO shuffle at all —
    // exactly how a compacted lakehouse table absorbs a CDC batch.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice", "o_orderstatus")
      Layout.writeBucketed(o.filter(col("o_orderkey") % 7 =!= 0), "merge_tgt_b", "o_orderkey", 4)
      Layout.writeBucketed(
        o.filter(col("o_orderkey") % 3 === 0 || col("o_orderkey") % 11 === 0)
          .withColumn("is_delete", col("o_orderkey") % 11 === 0),
        "merge_src_b", "o_orderkey", 4)
      val merged = Merge.merge(spark.table("merge_tgt_b"), spark.table("merge_src_b"),
        Seq("o_orderkey"))
      val mPlan = merged.queryExecution.executedPlan.toString
      assert(mPlan.contains("SortMergeJoin"), s"expected sort-merge merge join:\n$mPlan")
      assert(!mPlan.contains("Exchange"), s"bucketed MERGE must not shuffle:\n$mPlan")
      // and the merge result matches the un-bucketed path exactly
      val plain = Merge.merge(
        o.filter(col("o_orderkey") % 7 =!= 0),
        o.filter(col("o_orderkey") % 3 === 0 || col("o_orderkey") % 11 === 0)
          .withColumn("is_delete", col("o_orderkey") % 11 === 0),
        Seq("o_orderkey"))
      assert(merged.except(plain).count() === 0 && plain.except(merged).count() === 0)

      // CDC diff: same layout claim on the read-direction sibling
      Layout.writeBucketed(
        o.filter(col("o_orderkey") % 97 =!= 0)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("prev_price")),
        "cdc_prev_b", "k", 4)
      Layout.writeBucketed(
        o.filter(col("o_orderkey") % 89 =!= 0)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("cur_price")),
        "cdc_cur_b", "k", 4)
      val diff = spark.table("cdc_prev_b")
        .join(spark.table("cdc_cur_b"), Seq("k"), "full_outer")
        .withColumn("change",
          when(col("prev_price").isNull, "insert")
            .when(col("cur_price").isNull, "delete")
            .when(col("prev_price") =!= col("cur_price"), "update"))
        .filter(col("change").isNotNull)
      val dPlan = diff.queryExecution.executedPlan.toString
      assert(!dPlan.contains("Exchange"), s"bucketed CDC diff must not shuffle:\n$dPlan")
      assert(diff.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      Seq("merge_tgt_b", "merge_src_b", "cdc_prev_b", "cdc_cur_b")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("salted join ≡ plain join (skewed fact against unique dim)") {
    val li = Tables.lineitem(spark, sf()).select("l_orderkey", "l_linenumber", "l_quantity")
    val ord = Tables.orders(spark, sf())
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(ord, "l_orderkey")
    val salted = Layout.saltedJoin(li, ord, "l_orderkey", salt = 8,
      saltExpr = abs(hash(col("l_linenumber"), col("l_quantity"))))
    assert(salted.count() === plain.count())
    assert(salted.select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
      .except(plain.select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice"))
      .count() === 0)
  }

  test("replicate tags every copy: count multiplies by salt") {
    val r = Layout.replicate(Tables.region(spark, sf()), 3)
    assert(r.count() === 15)
    assert(r.groupBy("__salt").count().count() === 3)
  }

  test("salted join ≡ plain join under heavy key skew (90% one key)") {
    import spark.implicits._
    // 10k rows, 90% sharing key 1 — the pathological-height scenario
    val skewed = spark.range(10000)
      .select(
        when(col("id") % 10 =!= 0, 1L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val dim = spark.range(5000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val plain = skewed.join(dim, "k")
    val salted = Layout.saltedJoin(skewed, dim, "k", salt = 16,
      saltExpr = abs(hash(col("payload"))))
    assert(salted.count() === plain.count())
    assert(salted.select("k", "payload", "v").except(plain.select("k", "payload", "v")).count() === 0)
  }

  test("zorderKey interleaves bits (hand-computed lattice)") {
    import spark.implicits._
    // 4x4 lattice at bits=2: z(x,y) = interleave, x in the LOW lane
    val got = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (1L, 2L), (2L, 1L))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zorderKey(Seq((col("x"), 0L, 3L), (col("y"), 0L, 3L)), bits = 2).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // x=1,y=2: xbits 01, ybits 10 -> z = y1 x1 y0 x0 = 1 0 0 1 = 9
    assert(got === Map((0L, 0L) -> 0L, (3L, 0L) -> 5L, (0L, 3L) -> 10L,
      (3L, 3L) -> 15L, (1L, 2L) -> 9L, (2L, 1L) -> 6L))
  }

  /** Distinct files containing rows matching `cond` — the file-set a
    * min/max-stat catalog could not exclude (any file with ≥1 matching row
    * must be read; a clustered layout shrinks exactly this set). */
  private def filesTouched(path: String, cond: org.apache.spark.sql.Column): Long =
    spark.read.parquet(path).filter(cond)
      .select(input_file_name()).distinct().count()

  test("zorder layout: 2-D box filters touch few files on EITHER dimension") {
    val li = Tables.lineitem(spark, sf("sf0.01"))
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
    val tmp = java.nio.file.Files.createTempDirectory("zorder_spec")
    val zPath = s"$tmp/z"
    val linPath = s"$tmp/lin"
    try {
      Layout.zorderWrite(li, zPath, Seq("l_partkey", "l_suppkey"), bits = 8, files = 32)
      // contrast layout: same file count, lexicographic on l_partkey only
      li.repartitionByRange(32, col("l_partkey"))
        .sortWithinPartitions(col("l_partkey"))
        .write.mode("overwrite").parquet(linPath)

      // layout preserves content exactly
      val back = spark.read.parquet(zPath)
      assert(back.count() === li.count())
      assert(back.except(li).count() === 0 && li.except(back).count() === 0)

      // partkey box: both layouts cluster it (z uses 8 partkey bits, the
      // linear sort leads with it) — both should skip most files
      // matching partkey buckets share p7=p6=0, leaving s7/s6/s5 free in
      // the top-of-z file selector: ~8 of 32 z-prefix regions (+boundary)
      val partBox = col("l_partkey").between(100, 120)
      val zPart = filesTouched(zPath, partBox)
      assert(zPart <= 12, s"z-order partkey box touched $zPart files")
      assert(filesTouched(linPath, partBox) <= 4)

      // suppkey box: the linear layout has NO suppkey clustering — every
      // file contains the whole suppkey range; z-order still confines it
      val suppBox = col("l_suppkey").between(10, 12)
      val zSupp = filesTouched(zPath, suppBox)
      val linSupp = filesTouched(linPath, suppBox)
      assert(linSupp >= 28, s"expected linear layout to touch ~all 32 files, got $linSupp")
      assert(zSupp * 2 <= linSupp, s"z-order should halve the file set at worst: $zSupp vs $linSupp")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }

  test("compact: small-files table rewritten to the target file count, content exact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact")
    try {
      val e = Tables.events(spark, sf())
      val fragPath = tmp.resolve("frag").toString
      // simulate a micro-batch sink's accretion: 64 task files
      e.repartition(64).write.mode("overwrite").parquet(fragPath)
      def files(p: String) = new java.io.File(p).listFiles()
        .count(f => f.getName.endsWith(".parquet"))
      val nFrag = files(fragPath)
      assert(nFrag >= 32, s"expected a fragmented table, got $nFrag files")

      val frag = spark.read.parquet(fragPath)
      val n = frag.count()
      val outPath = tmp.resolve("compacted").toString
      Layout.compact(frag, outPath, targetFileRows = (n + 3) / 4,
        sortCols = Seq("event_id"))
      val nOut = files(outPath)
      assert(nOut <= 5, s"expected ~4 compacted files, got $nOut")

      // content survives exactly, and the sorted rewrite clusters the key:
      // a point lookup touches one file
      val back = spark.read.parquet(outPath)
      assert(back.count() === n)
      assert(back.except(frag).count() === 0 && frag.except(back).count() === 0)
      val hit = spark.read.parquet(outPath).filter(col("event_id") === 42)
        .select(org.apache.spark.sql.functions.input_file_name()).distinct().count()
      assert(hit === 1)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }
}
