package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpecBase {

  test("linearScore: feature count is unigrams + bigrams and uniform weights sum exactly") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "x")).toDF("doc_id", "text")
    val plusOne = spark.range(64).select(col("id").as("bucket"), lit(1L).as("w"))
    val out = Classifier.linearScore(docs, "doc_id", "text", plusOne,
      numBuckets = 64, logitScale = 1.0).orderBy("doc_id").collect()
    // 4 tokens → 4 unigram + 3 bigram features; 1 token → 1 + 0
    assert(out.map(r => (r.getLong(0), r.getAs[Long]("n_feats"))).toSeq ===
      Seq((1L, 7L), (2L, 1L)))
    assert(out.forall(r => r.getAs[Long]("sum_w") === r.getAs[Long]("n_feats")))
    assert(out.forall(_.getAs[Boolean]("label")), "all-positive weights → label true")
    // mean-pooled logit of all-ones weights is exactly 1 → sigmoid(1)
    assert(math.abs(out.head.getAs[Double]("prob") - 1.0 / (1.0 + math.exp(-1.0))) < 1e-12)
  }

  test("linearScore: negative weights flip the decision") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val minusOne = spark.range(64).select(col("id").as("bucket"), lit(-1L).as("w"))
    val out = Classifier.linearScore(docs, "doc_id", "text", minusOne,
      numBuckets = 64, logitScale = 1.0).collect().head
    assert(!out.getAs[Boolean]("label"))
    assert(out.getAs[Double]("prob") < 0.5)
  }

  test("dsir: target-domain docs score positive, off-domain negative, flag matches sign") {
    import spark.implicits._
    val docs = (
      (0 until 4).map(i => (i.toLong, "good clean prose here", "en")) ++
        (0 until 4).map(i => (10L + i, "junk spam noise blob", "de"))
      ).toDF("doc_id", "text", "lang")
    // full bucket space: at 64 buckets these six bigrams genuinely
    // collide (verified), which mixes the distributions — the operator
    // is collision-correct but the sign assertions need clean buckets
    val out = Classifier.dsirWeights(docs, "doc_id", "text",
      col("lang") === "en", numBuckets = 65536)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("sum_lr"), r.getAs[Boolean]("is_targetlike"))).toMap
    assert(out.size === 8)
    (0 until 4).foreach { i =>
      assert(out(i.toLong)._1 > 0 && out(i.toLong)._2,
        "target-exclusive bigrams must weigh positive")
    }
    (0 until 4).foreach { i =>
      assert(out(10L + i)._1 < 0 && !out(10L + i)._2,
        "off-domain-exclusive bigrams must weigh negative")
    }
    assert(out.values.forall { case (s, f) => f === (s > 0) })
  }

  test("dsir: docs with fewer than two tokens have no bigram features and are not scored") {
    import spark.implicits._
    val docs = Seq((1L, "only", "en"), (2L, "two words", "en"))
      .toDF("doc_id", "text", "lang")
    val ids = Classifier.dsirWeights(docs, "doc_id", "text", col("lang") === "en",
      numBuckets = 64).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L))
  }
}
