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

  test("cosine_sim is SQL-callable after registration") {
    graft.plans.GraftExtensions.register(spark)
    Tables.load(spark, sf(), "embeddings").createOrReplaceTempView("emb_ext")
    val r = spark.sql("SELECT max(cosine_sim(embedding, embedding)) FROM emb_ext").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
