package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpecBase {

  private lazy val emb = Tables.load(spark, sf(), "embeddings")

  test("native expression matches the portable zip_with implementation") {
    val pairs = emb.limit(50).select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(emb.limit(50).select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id"))
    val diffs = pairs.select(
      abs(VectorFunctions.cosineNative(col("a"), col("b")) -
        VectorFunctions.cosine(col("a"), col("b"))).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(diffs === 0.0, "accumulation order must be identical, not just close")
  }

  test("native cosine participates in whole-stage codegen") {
    val df = emb.select(VectorFunctions.cosineNative(col("embedding"), col("embedding")).as("c"))
    // the "*(n)" stage prefix marks WholeStageCodegen nodes
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"),
      "cosine_sim must not fall out of whole-stage codegen")
    val self = df.agg(min("c"), max("c")).head()
    assert(math.abs(self.getDouble(0) - 1.0) < 1e-12 && math.abs(self.getDouble(1) - 1.0) < 1e-12)
  }

  test("ragged pair returns null, matching the portable form") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val r = df.select(VectorFunctions.cosineNative(col("a"), col("b"))).head()
    assert(r.isNullAt(0), "length mismatch must be null, not a truncated score")
  }

  test("NaN cosine (zero vector) ranks last in top-k, deterministically") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 0.0f)), // zero vector → NaN cosine
      (3L, Seq(0.8f, 0.2f))).toDF("vec_id", "embedding")
    val top = graft.operators.Similarity.bruteForceTopK(corpus,
      corpus.filter(col("vec_id") === 0L), "vec_id", "embedding", 3)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(top === Array(1L, 3L, 2L), "NaN-scored neighbor must rank after real scores")
  }

  test("SelfIntersectFold rewrites sorted_intersect_count(x, x) to size(x)") {
    import spark.implicits._
    val df = Seq(Seq(1L, 2L, 3L), null).toDF("a")
      .select(graft.plans.SortedIntersectCount(col("a"), col("a")).as("c"))
    val folded = graft.plans.SelfIntersectFold(df.queryExecution.analyzed)
    assert(!folded.toString.contains("sorted_intersect_count"),
      "self-intersection must fold out of the plan")
    // soundness: the fold preserves null semantics end-to-end
    val rows = org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, folded).collect()
    assert(rows.map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq === Seq(3, -1))
  }

  test("cosine_sim is SQL-callable after registration") {
    graft.plans.GraftExtensions.register(spark)
    Tables.load(spark, sf(), "embeddings").createOrReplaceTempView("emb_ext")
    val r = spark.sql("SELECT max(cosine_sim(embedding, embedding)) FROM emb_ext").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
