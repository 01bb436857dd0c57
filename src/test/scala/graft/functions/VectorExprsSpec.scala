package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables
import graft.queries.Sim

/** Native vector kernels must be BIT-identical to the HOF algebra the
  * DuckDB oracle mirrors — otherwise swapping them into the oracle queries
  * would silently change hashes. Also pins codegen (no fallback). */
class VectorExprsSpec extends SparkSpec {

  private lazy val pairs = {
    val e = Tables.embeddings(spark, sf()).filter(col("vec_id") < 40)
    e.select(col("vec_id").as("ida"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("idb"), col("embedding").as("vb")))
      .filter(col("ida") < col("idb"))
  }

  test("graft_dot ≡ HOF left-fold, bitwise") {
    val diff = pairs.select(
      Sim.dot(col("va"), col("vb")).as("native"),
      Sim.dotHof(col("va"), col("vb")).as("hof"))
      .filter(col("native") =!= col("hof")) // exact double equality
    assert(diff.count() === 0)
  }

  test("graft_cosine ≡ dotHof/(√·√), bitwise") {
    val hofCos = Sim.dotHof(col("va"), col("vb")) /
      (sqrt(Sim.dotHof(col("va"), col("va"))) * sqrt(Sim.dotHof(col("vb"), col("vb"))))
    val diff = pairs.select(
      Sim.cosine(col("va"), col("vb")).as("native"), hofCos.as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() === 0)
  }

  test("kernels work from plain SQL via the session extension") {
    Tables.embeddings(spark, sf()).limit(5).createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      "SELECT graft_cosine(embedding, embedding) AS c FROM emb_sql").collect()
    assert(r.forall(x => math.abs(x.getDouble(0) - 1.0) < 1e-9))
  }

  test("zero-denominator contract: zero/empty vectors → NULL, never NaN") {
    // graft_cosine: zero vector on either side → NULL (DuckDB's x/0 NULL);
    // graft_jaccard: two empty sets → NULL (DuckDB's 0/0 NULL). Pinned in
    // both the interpreted path (collect) and codegen (the SQL below runs
    // inside whole-stage codegen for cosine).
    val row = spark.sql(
      """SELECT graft_cosine(CAST(array(0.0, 0.0) AS ARRAY<FLOAT>),
        |                    CAST(array(1.0, 2.0) AS ARRAY<FLOAT>)) AS zc,
        |       graft_cosine(CAST(array() AS ARRAY<FLOAT>),
        |                    CAST(array() AS ARRAY<FLOAT>)) AS ec,
        |       graft_jaccard(CAST(array() AS ARRAY<STRING>),
        |                     CAST(array() AS ARRAY<STRING>)) AS ej,
        |       graft_jaccard(CAST(array() AS ARRAY<STRING>),
        |                     array('a')) AS hj""".stripMargin).collect().head
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
    assert(row.getDouble(3) === 0.0) // one empty side: 0/(0+1-0), a real zero
    // and NULL-producing non-null inputs must not be folded away by a
    // wrong nullability: isnull() over the kernels stays truthful
    val n = spark.sql(
      """SELECT isnull(graft_cosine(CAST(array(0.0) AS ARRAY<FLOAT>),
        |                           CAST(array(1.0) AS ARRAY<FLOAT>)))""".stripMargin)
      .collect().head.getBoolean(0)
    assert(n)
  }

  test("null inputs propagate null, mismatched dims use common prefix") {
    val df = spark.sql(
      """SELECT graft_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |                 CAST(array(3.0, 4.0, 5.0) AS ARRAY<FLOAT>)) AS d,
        |        graft_dot(CAST(NULL AS ARRAY<FLOAT>),
        |                 CAST(array(1.0) AS ARRAY<FLOAT>)) AS n""".stripMargin)
    val row = df.collect().head
    assert(row.getDouble(0) === 11.0)
    assert(row.isNullAt(1))
  }

  test("graft_srp: codegen ≡ interpreted, scale-invariant signs, SQL-reachable") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf()).filter(col("vec_id") < 50)
    val srp = call_function("graft_srp", col("embedding"), lit(4), lit(8))
    // codegen path (whole-stage projection over parquet) vs interpreted
    // path (Literal children → TernaryExpression.eval): identical
    val fromCodegen = e.select(col("vec_id"), srp.as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    e.select(col("vec_id"), col("embedding")).collect().foreach { r =>
      val got = SrpSignature(
        Literal.create(r.getSeq[Float](1), ArrayType(FloatType)),
        Literal(4), Literal(8)).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
      assert(got.toSeq == fromCodegen(r.getLong(0)),
        s"interp/codegen mismatch for vec ${r.getLong(0)}")
    }
    // sign-LSH is scale-invariant: v and 3·v produce identical buckets
    val scaled = e.select(col("vec_id"),
      transform(col("embedding"), x => (x * 3.0f).cast("float")).as("embedding"))
    val sigB = scaled.select(col("vec_id"), srp.as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(fromCodegen == sigB, "buckets must be invariant to vector scale")
    // 4 bands, each bucket within 8 bits
    assert(fromCodegen.values.forall(s => s.size == 4 && s.forall(b => b >= 0 && b < 256)))
    // available from plain SQL via the session extension
    e.limit(3).createOrReplaceTempView("srp_sql")
    val n = spark.sql("SELECT size(graft_srp(embedding, 2, 4)) AS s FROM srp_sql")
      .collect()
    assert(n.forall(_.getInt(0) == 2))
  }
}
