package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Space-filling-curve keys for multi-dimensional data clustering.
  *
  * Sorting a table by ONE column gives parquet min/max pruning on that
  * column only — every file spans the full range of every other
  * column. Sorting by the Morton (Z-order) interleave of two columns
  * gives locality on BOTH: a file's rows are close in (a, b) space, so
  * a 2-D box predicate overlaps few files. This is the standard
  * lakehouse layout trick (Delta/Iceberg `ZORDER BY`), here as a plain
  * Catalyst expression usable with `repartitionByRange` +
  * `sortWithinPartitions` on any parquet table.
  */
object SpaceFillingCurve {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integral columns: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. A static sum of shift/mask terms — whole-stage codegen
    * folds it into one expression, no lambdas, no UDF.
    *
    * PRECONDITION: inputs must already lie in `[0, 2^bits)`. Larger
    * values are silently truncated to their low bits (ids 0 and
    * 2^bits get the SAME key — clustering quietly degrades) and
    * negative values interleave sign bits into garbage. Quantize
    * first — `IndexQpu.materializeZOrder` does min-max scaling into
    * range and is the safe entry point for raw columns.
    */
  def mortonInterleave(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      (shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }
}
