package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** zlib-deflate compressibility as a document-quality signal — the
  * Gopher/MassiveText-era heuristic the rule battery (SURVEY row 154)
  * cannot express in closed form: heavily repetitive or boilerplate
  * text deflates far below natural prose, and extreme ratios in
  * EITHER direction mark low-value training documents (near-random
  * strings barely compress; template spam collapses).
  *
  * Per-partition JDK `Deflater` (one instance, `reset()` per row — no
  * per-row allocation), fixed compression level so the byte count is
  * deterministic for a given zlib build; the signal is a plain map
  * over the corpus scan, no shuffle at any scale. Not expressible in
  * an external SQL engine, so the operator is spec-pinned (ordering
  * of repetitive vs diverse text, determinism, edge cases) rather
  * than oracle-replayed.
  *
  * Output: (id, n_raw, n_deflate, ratio_pct) with `ratio_pct` =
  * ⌊100·n_deflate/n_raw⌋ (integer; smaller = more compressible).
  * NULL or empty text rows are dropped — they carry no signal and
  * would divide by zero.
  */
object CompressionSignal {

  def compressionRatio(df: DataFrame, idCol: String, textCol: String,
                       level: Int = 6): DataFrame = {
    require(level >= 0 && level <= 9, s"deflate level must be in [0, 9], got $level")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull && length(col(textCol)) > 0)
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(level)
        // release the native zlib buffer at task end rather than at
        // finalization — many short-lived partitions would otherwise
        // hold native memory until GC gets around to them
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var n = 0
          while (!deflater.finished()) n += deflater.deflate(buf)
          (id, raw.length, n, (100L * n / raw.length).toInt)
        }
      }
      .toDF("id", "n_raw", "n_deflate", "ratio_pct")
  }
}
