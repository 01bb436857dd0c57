package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Explicit-schema file sources: clean/quarantine split for JSON and CSV. */
class SourcesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("readJson: schema applied, corrupt lines quarantined not fatal") {
    val dir = Files.createTempDirectory("srcjson").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.jsonl"),
      """{"id": 1, "name": "alpha", "score": 1.5}
        |{"id": 2, "name": "beta", "score": 2.5}
        |{nope this is not json
        |{"id": "NaNope", "name": "gamma", "score": 3.5}
        |""".stripMargin)
    val read = Sources.readJson(spark, dir, schema)
    val (clean, quarantine) = (read.clean, read.quarantine)
    // line 3 is unparseable; line 4 has a bad id type (null after coercion
    // failure but the record itself parses → stays clean with null id)
    assert(clean.filter("id IS NOT NULL").count() === 2)
    assert(quarantine.count() >= 1)
    assert(clean.schema.fieldNames.toSeq === Seq("id", "name", "score"))
  }

  test("readCsv: header + types enforced, malformed rows quarantined") {
    val dir = Files.createTempDirectory("srccsv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.csv"),
      """id,name,score
        |1,alpha,1.5
        |2,beta,2.5
        |oops,gamma,not_a_number
        |""".stripMargin)
    val read = Sources.readCsv(spark, dir, schema)
    val (clean, quarantine) = (read.clean, read.quarantine)
    assert(clean.filter("id IS NOT NULL AND score IS NOT NULL").count() === 2)
    assert(quarantine.count() === 1)
    assert(quarantine.collect().head.getString(0).contains("oops"))
    read.release() // unpersist the shared parse cache
  }

  test("orc: lossless round trip, filters pushed to the ORC scan") {
    val dir = Files.createTempDirectory("srcorc").toString + "/t"
    val orders = graft.catalog.Tables.orders(spark, sf())
    Sources.writeOrc(orders, dir)
    val back = Sources.readOrc(spark, dir)
    assert(back.schema === orders.schema)
    assert(back.count() === orders.count())
    assert(back.exceptAll(orders).isEmpty)
    // pushdown posture survives the format swap
    val plan = back.filter("o_orderkey = 4242").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,4242)]")
      || plan.contains("EqualTo(o_orderkey,4242)"),
      s"expected key pushdown into the ORC scan:\n$plan")
  }

  test("avro: lossless round trip incl. nulls; by-name projection and add-column evolution") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("avro_rt").toString
    val df = Seq(
      (1L, Some(1.5), "a", Some(true)),
      (2L, None, "b", Some(false)),
      (3L, Some(-0.25), "", None))
      .toDF("id", "score", "tag", "flag")
    graft.sources.AvroSource.write(df, s"$dir/t1")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/t1/_SUCCESS")))
    val back = graft.sources.AvroSource.read(spark, s"$dir/t1", df.schema)
    assert(back.schema === df.schema)
    assert(back.collect().map(_.toSeq).toSet === df.collect().map(_.toSeq).toSet,
      "avro round trip must be lossless, nulls included")
    // by-name projection: a narrower reader schema reads only its fields
    val narrow = StructType(Seq(StructField("tag", StringType),
      StructField("id", LongType)))
    val proj = graft.sources.AvroSource.read(spark, s"$dir/t1", narrow)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(proj === Set(("a", 1L), ("b", 2L), ("", 3L)))
    // add-column evolution: a reader schema with a field the writer never
    // had surfaces it as null (the mergeSchema analog, by name)
    val wider = StructType(df.schema.fields :+ StructField("added", LongType))
    val evo = graft.sources.AvroSource.read(spark, s"$dir/t1", wider)
    assert(evo.filter(org.apache.spark.sql.functions.col("added").isNotNull)
      .count() === 0)
    assert(evo.count() === 3)
  }
}
