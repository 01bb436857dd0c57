package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** cleanExpr on inputs the synthetic corpus doesn't contain — markup,
  * emails, messy whitespace — so the normalization semantics are pinned
  * beyond what the oracle checks. */
class TextCleanSpec extends SparkSpec {

  private def clean(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("text").select(Text.cleanExpr(col("text"))).collect().head.getString(0)
  }

  test("markup stripped, emails masked, whitespace collapsed, lowercased") {
    assert(clean("<p>Hello <b>World</b></p>") === "hello world")
    assert(clean("Contact Bob.Smith+x@Example.COM today") === "contact [email] today")
    assert(clean("a\t\tb\r\nc   d ") === "a b c d")
    assert(clean("  MiXeD Case  ") === "mixed case")
    // idempotent: clean(clean(x)) == clean(x)
    val once = clean("<div>A&B  c@d.e</div>")
    assert(clean(once) === once)
  }

  test("clean text is unchanged (stability on already-normal corpus text)") {
    assert(clean("plain lowercase words") === "plain lowercase words")
  }
}
