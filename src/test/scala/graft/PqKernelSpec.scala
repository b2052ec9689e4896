package graft

import graft.plans.{PqAdc, PqCodes, PqKernels}
import org.apache.spark.sql.functions._

/** The native PqCodes / PqAdc kernels must be BIT-IDENTICAL to the
  * zip_with/aggregate lambda chains they replace — the sim_ann_pq
  * DuckDB oracle replays that chain's exact double arithmetic, so any
  * fold-order divergence is a red correctness row.
  */
class PqKernelSpec extends SparkSpecBase {

  private val subspaces = 16
  private val subDim = 4

  private lazy val emb = Tables.load(spark, sf(), "embeddings")

  private lazy val codebook: PqKernels.Codebook = {
    val donors = emb.orderBy("vec_id").limit(16).collect()
      .map(_.getSeq[Float](1))
    Array.tabulate(subspaces) { j =>
      donors.map(_.slice(j * subDim, (j + 1) * subDim).map(_.toDouble).toArray)
    }
  }

  private def sub(vec: String, j: Int) =
    slice(col(vec).cast("array<double>"), j * subDim + 1, subDim)
  private def l2sq(vecSub: org.apache.spark.sql.Column, cent: Array[Double]) =
    aggregate(zip_with(vecSub, typedlit(cent.toSeq), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)

  test("PqCodes == array_min over (dist, cell) struct lambda chain") {
    def codeCol(j: Int) =
      array_min(array(codebook(j).zipWithIndex.map { case (cv, c) =>
        struct(l2sq(sub("embedding", j), cv).as("d"), lit(c).as("cell"))
      }.toIndexedSeq: _*)).getField("cell")
    val chain = emb.select(col("vec_id") +:
      (0 until subspaces).map(j => codeCol(j).as(s"c$j")): _*)
    val kernel = emb.select(col("vec_id"), PqCodes(col("embedding"), codebook).as("cs"))
      .select(col("vec_id") +:
        (0 until subspaces).map(j => element_at(col("cs"), j + 1).as(s"c$j")): _*)
    assert(kernel.exceptAll(chain).isEmpty && chain.exceptAll(kernel).isEmpty)
  }

  test("PqAdc == fixed-order lambda sum, bitwise, against real codes") {
    val coded = emb.select(col("vec_id").as("nid"),
      PqCodes(col("embedding"), codebook).as("codes"))
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val pairs = q.crossJoin(coded)
    val lambdaAdc = (0 until subspaces).map { j =>
      val cents = typedlit(codebook(j).map(_.toSeq).toSeq)
      aggregate(zip_with(sub("qv", j), element_at(cents, element_at(col("codes"), j + 1) + 1),
        (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x)
    }.reduceLeft(_ + _)
    val both = pairs.select(col("qid"), col("nid"),
      PqAdc(col("qv"), col("codes"), codebook).as("k"), lambdaAdc.as("l"))
    val mismatches = both.filter(col("k") =!= col("l")).count()
    assert(mismatches === 0L, "ADC kernel must match the lambda fold bitwise")
  }

  test("PqCodes nulls out ragged vectors instead of misindexing") {
    import spark.implicits._
    val ragged = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val r = ragged.select(PqCodes(col("embedding"), codebook).as("c")).head()
    assert(r.isNullAt(0))
  }
}
