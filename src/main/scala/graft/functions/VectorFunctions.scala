package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built from
  * codegen'd collection functions (`zip_with` / `aggregate`) — no Scala
  * UDFs, so whole-stage codegen spans the similarity joins.
  *
  * Elements are cast to double before arithmetic and folded
  * left-to-right, which keeps results bit-identical to an external
  * engine computing `dot/(|a||b|)` the same way (the oracle check
  * relies on this).
  */
object VectorFunctions {

  private def d(a: Column): Column = a.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Codegen'd native cosine over `array<float>` (see
    * [[graft.plans.CosineSimilarity]]) — same accumulation order and
    * result as [[cosine]], ~an order of magnitude faster in pair joins.
    */
  def cosineNative(a: Column, b: Column): Column =
    graft.plans.CosineSimilarity(a, b)

  /** TRUE iff every element of the vector is present and finite — the
    * embedding-family input contract (r13 fuzz): a NaN/±Inf element
    * poisons norms and, under ANSI mode, makes the fixed-point
    * quantization cast throw, so non-finite vectors are treated like
    * NULL-element vectors everywhere. DuckDB mirror:
    * `len(list_filter(v, x -> x IS NULL OR NOT isfinite(x))) = 0`.
    * Native codegen kernel ([[graft.plans.AllFinite]]): the `exists`
    * HOF form plans an interpreted lambdafunction on the corpus scan —
    * the regression class PlanAuditSpec pins for the PQ path.
    */
  def allFinite(vec: Column): Column = graft.plans.AllFinite(vec)

  /** Random-hyperplane LSH bucket ids: see the native
    * [[graft.plans.HyperplaneBuckets]] kernel (one fused loop per row;
    * deterministic splitmix64 sign matrix). Exposed here so operator
    * code has one entry point for vector primitives.
    */
  def hyperplaneBuckets(v: Column, dim: Int, planes: Int, tables: Int): Column =
    graft.plans.HyperplaneBuckets(v, dim, planes, tables)
}
