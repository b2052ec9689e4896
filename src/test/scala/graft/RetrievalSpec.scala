package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpecBase {

  private lazy val docs = Tables.load(spark, sf(), "documents")

  test("bm25: a query that IS a document's prefix retrieves that document first") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark shuffle partition tuning guide"),
      (2L, "cooking pasta with tomato sauce"),
      (3L, "spark partition counts and shuffle spill"),
      (4L, "tomato growing season notes")
    ).toDF("doc_id", "text")
    val q = Seq((100L, "spark shuffle partition")).toDF("query_id", "qtext")
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text", q, k = 2)
      .orderBy("rank").collect()
    assert(top.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 3L),
      "both match all three terms; doc 1's shorter length norm wins")
    assert(top.head.getAs[Double]("score") > top.last.getAs[Double]("score"))
  }

  test("bm25: duplicate query terms score once and rank ties break on doc_id") {
    import spark.implicits._
    val corpus = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val q = Seq((0L, "a a b")).toDF("query_id", "qtext")
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text", q, k = 2)
      .orderBy("rank").collect()
    // identical stats → exact integer-score tie → doc_id ascending
    assert(top.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
    assert(top.head.getAs[Double]("score") === top.last.getAs[Double]("score"))
  }

  test("inverted index: blocks partition each term's postings and tf counts are exact") {
    val idx = Retrieval.invertedIndex(docs, "doc_id", "text", numBlocks = 4)
    // reassemble one common token's postings across blocks
    val token = docs.select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .groupBy("t").count().orderBy(desc("count"), col("t")).limit(1)
      .collect().head.getString(0)
    val rows = idx.filter(col("token") === token).collect()
    assert(rows.length > 1, s"a corpus-wide token should span >1 block")
    val posted = rows.flatMap(_.getAs[String]("postings").split(" "))
      .map { e => val Array(d, tf) = e.split(":"); (d.toLong, tf.toLong) }.toMap
    val expected = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .filter(col("t") === token).groupBy("doc_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(posted === expected, "blocks must union to the exact postings")
    // df/cf aggregate consistently
    assert(rows.map(_.getAs[Long]("df_block")).sum === expected.size)
    assert(rows.map(_.getAs[Long]("cf_block")).sum === expected.values.sum)
  }

  test("rrf: a doc ranked by both systems beats single-system docs at the same rank") {
    import spark.implicits._
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 10L, 2), (1L, 12L, 1)).toDF("query_id", "doc_id", "rank")
    val fused = Retrieval.rrfFuse(a, b, k = 3).orderBy("fused_rank").collect()
    assert(fused.head.getAs[Long]("doc_id") === 10L, "doc in both lists wins")
    assert(fused.head.getAs[Double]("rrf_score") === 1.0 / 61 + 1.0 / 62)
    // 11 (rank 2 in a only) and 12 (rank 1 in b only): 12 scores higher
    assert(fused(1).getAs[Long]("doc_id") === 12L)
    assert(fused(2).getAs[Long]("doc_id") === 11L)
  }

  test("rrf: exact score ties (mirrored ranks) break on doc_id") {
    import spark.implicits._
    val a = Seq((1L, 20L, 1), (1L, 21L, 2)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 21L, 1), (1L, 20L, 2)).toDF("query_id", "doc_id", "rank")
    val fused = Retrieval.rrfFuse(a, b, k = 2).orderBy("fused_rank").collect()
    assert(fused.map(_.getAs[Long]("doc_id")).toSeq === Seq(20L, 21L))
  }
}
