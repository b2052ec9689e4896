package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Sketch-based approximate aggregations for corpus-scale profiling —
  * the answers a 100-TB pipeline wants without a full groupBy shuffle
  * of every distinct key:
  *
  * - HLL++ distinct counts are already first class
  *   (`approx_count_distinct`, SURVEY row 46).
  * - Count-min sketches estimate per-key frequencies in ONE pass and
  *   sublinear memory: the aggregation is map-side-combinable (Spark's
  *   `count_min_sketch` merges sketches associatively), the result is
  *   a few KB regardless of cardinality, and lookups never
  *   underestimate (est >= true; est <= true + eps*N with probability
  *   >= confidence).
  */
object Sketches {

  /** Build a count-min sketch of `keyCol` in one distributed pass. */
  def countMin(df: DataFrame, keyCol: Column,
               eps: Double = 0.001, confidence: Double = 0.99,
               seed: Int = 42): CountMinSketch = {
    val bytes = df.select(
      count_min_sketch(keyCol, lit(eps), lit(confidence), lit(seed)).as("cms"))
      .head().getAs[Array[Byte]]("cms")
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Estimated frequencies for a bounded probe set — e.g. the heavy
    * hitters surfaced by a coarse sample — without any per-key shuffle.
    */
  def estimateAll(sketch: CountMinSketch, probes: Seq[Any]): Map[Any, Long] =
    probes.map(p => p -> sketch.estimateCount(p)).toMap
}
