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

  /** Random-hyperplane LSH bucket id: `numPlanes` sign bits, planes
    * derived deterministically from md5 so buckets are reproducible
    * across runs/engines. Plane p component j = ±1 by one md5 bit.
    */
  def hyperplaneBucket(v: Column, dim: Int, numPlanes: Int, seedOffset: Int = 0): Column = {
    val bits = (0 until numPlanes).map { p =>
      // sign of sum_j v[j] * s_pj, s_pj = ±1 from a stable hash bit
      val signed = aggregate(
        zip_with(d(v), sequence(lit(0), lit(dim - 1)), (x, j) =>
          x * (HashFunctions.seededHash56(seedOffset + p, j.cast("string")) % 2 * 2 - 1).cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(signed > 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }
    bits.reduce(_ + _)
  }
}
