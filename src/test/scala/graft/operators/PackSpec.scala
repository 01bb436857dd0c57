package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** Sequence packing / chunking invariants that the row-level oracle can't
  * see: offset contiguity across partition slices, budget bounds, and
  * lossless chunk coverage. */
class PackSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf()).cache()

  test("packSequences: offsets are contiguous — each doc starts where the previous ended") {
    val packed = Pack.packSequences(docs, 128L).orderBy("doc_id").collect()
    var expect = 0L
    packed.foreach { r =>
      assert(r.getAs[Long]("start_offset") === expect,
        s"doc ${r.getAs[Long]("doc_id")} offset gap")
      expect += r.getAs[Long]("n_tokens")
    }
    // derived columns honor the budget algebra
    packed.foreach { r =>
      val off = r.getAs[Long]("start_offset")
      assert(r.getAs[Long]("seq_id") === off / 128L)
      assert(r.getAs[Long]("offset_in_seq") === off % 128L)
      assert(r.getAs[Long]("offset_in_seq") < 128L)
    }
  }

  test("packSequences: offsets survive a pathological partition count") {
    // one doc per range slice vs everything in one slice — same packing
    val few = Pack.packSequences(docs.repartition(1), 64L)
    val many = Pack.packSequences(docs.repartition(32), 64L)
    assert(few.exceptAll(many).isEmpty && many.exceptAll(few).isEmpty)
  }

  test("chunk: a doc at or under width yields exactly one window (no contained duplicate)") {
    import spark.implicits._
    // 25 tokens with width=32/step=24: the old (n-1) div step + 1 formula
    // emitted a second window (tokens 25..25) fully contained in the first
    val d = Seq((1L, Seq.fill(25)("tok").mkString(" ")),
      (2L, Seq.fill(32)("tok").mkString(" ")),
      (3L, Seq.fill(33)("tok").mkString(" "))).toDF("doc_id", "text")
    val counts = Pack.chunk(d, 32, 8).groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("chunk: windows cover every token and respect width/overlap") {
    val width = 8; val overlap = 3; val step = width - overlap
    val chunks = Pack.chunk(docs.filter(col("doc_id") < 50), width, overlap)
    // every chunk ≤ width tokens; only a doc's last chunk may be short is
    // not guaranteed (short docs), but every chunk is non-empty
    assert(chunks.filter(col("chunk_len") > width || col("chunk_len") < 1).count() === 0)
    // coverage: last chunk's start + len == n_tokens for every doc
    val last = chunks.groupBy("doc_id")
      .agg(max(col("chunk_id")).as("last_id"), max(col("chunk_id") * step
        + col("chunk_len")).as("covered"))
    val want = docs.filter(col("doc_id") < 50)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    assert(last.join(want, "doc_id").filter(col("covered") =!= col("n")).count() === 0)
  }
}
