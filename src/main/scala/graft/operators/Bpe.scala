package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Byte-pair-encoding vocabulary training (Sennrich et al. 2016, the
  * subword-induction algorithm behind GPT/Llama-family tokenizers) —
  * complementing frequency-based vocab induction (SURVEY row 108)
  * with the MERGE-LEARNING half a real tokenizer pipeline needs.
  *
  * Scale shape — the part that matters at 100 TB: the corpus is
  * touched ONCE, by a combinable (word, freq) aggregation; every
  * merge round then runs on the WORD-FREQUENCY table (vocabulary-
  * sized, zipf-bounded — millions of rows at any corpus size, not
  * corpus-sized), exactly how reference BPE trainers operate on a
  * word-count dict. Per round: one explode of adjacent symbol pairs
  * + one weighted combinable count + one ordered `limit(1)` argmax
  * (driver receives ONE row — the learned merge, which IS the
  * algorithm's sequential dependency), then a vocabulary-sized map
  * applies the merge. The word table is localCheckpointed per round
  * (same lineage-truncation discipline as [[PageRank]]): each round's
  * plan references the previous table once per stage, and without
  * truncation the merged-symbol map UDF chain compounds.
  *
  * Determinism: argmax ties break on (pair_left, pair_right)
  * lexicographically — the spec pins the learned merge sequence on a
  * hand-verified corpus, so any drift in tie-breaking or counting
  * fails the build.
  */
object Bpe {

  final case class WordFreq(syms: Seq[String], freq: Long)
  final case class Merge(rank: Int, left: String, right: String, pair_freq: Long)

  /** Learn `nMerges` BPE merges from the corpus' whitespace words.
    * Returns the merge table (rank, left, right, pair_freq) — the
    * artifact a tokenizer ships. Words are split to single characters
    * plus a `</w>` end-of-word marker on the last character, the
    * original formulation.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordTable(docs, textCol)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      // weighted adjacent-pair counts over the word table; the argmax
      // is a combinable count + TakeOrdered — never a global sort of
      // the pair space
      val top = words.flatMap(w =>
          w.syms.sliding(2).collect { case Seq(a, b) => ((a, b), w.freq) })
        .groupByKey(_._1).agg(sum($"_2").as[Long])
        .toDF("pair", "pair_freq")
        .select(col("pair._1").as("left"), col("pair._2").as("right"), col("pair_freq"))
        .orderBy(col("pair_freq").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val row = top.head
        val (l, rt, f) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += Merge(r, l, rt, f)
        words = applyMerge(words, l, rt).localCheckpoint(true)
        r += 1
      }
    }
    merges.toSeq.toDF()
  }

  /** Tokenize the corpus with a learned merge table: replay the merges
    * in rank order against each word — word-internal, so a pure map
    * over the corpus scan (zero shuffle); the merge list is a small
    * driver-side constant shipped in the task closure, rank order is
    * the BPE contract.
    *
    * Kernel shape: a `mapPartitions` loop with REUSED symbol buffers —
    * the two scratch arrays are allocated once per PARTITION and
    * ping-ponged across merge rounds, so the corpus-sized hot path
    * allocates only its output rows (the Scala-udf version this
    * replaces built a fresh Seq per word per merge round and paid udf
    * serde on every row — the one non-kernel corpus-scan in the repo).
    * Tokenization matches [[TextFunctions.tokens]] (whitespace split of
    * the trimmed text) so the kernel and the SQL surface agree.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val in = docs.select(col(idCol), col(textCol))
    val outSchema = StructType(Seq(
      in.schema.head,
      StructField("bpe_tokens", ArrayType(StringType, containsNull = false), nullable = false),
      StructField("n_bpe", IntegerType, nullable = false)))
    val mArr = merges.toArray
    in.mapPartitions { rows =>
      // per-partition scratch: current/next symbol buffers + doc output
      var cur = new scala.collection.mutable.ArrayBuffer[String](64)
      var nxt = new scala.collection.mutable.ArrayBuffer[String](64)
      val out = new scala.collection.mutable.ArrayBuffer[String](256)
      rows.map { row =>
        out.clear()
        val text = if (row.isNullAt(1)) "" else row.getString(1)
        val toks = text.trim.split("\\s+")
        var t = 0
        while (t < toks.length) {
          val w = toks(t)
          if (w.nonEmpty) {
            cur.clear()
            var i = 0
            while (i < w.length) {
              cur += (if (i == w.length - 1) w.charAt(i).toString + "</w>"
                      else w.charAt(i).toString)
              i += 1
            }
            var m = 0
            while (m < mArr.length) {
              val l = mArr(m)._1; val r = mArr(m)._2
              nxt.clear()
              var j = 0
              while (j < cur.length) {
                if (j + 1 < cur.length && cur(j) == l && cur(j + 1) == r) {
                  nxt += (l + r); j += 2 // left-to-right, non-overlapping
                } else { nxt += cur(j); j += 1 }
              }
              val tmp = cur; cur = nxt; nxt = tmp // ping-pong, no realloc
              m += 1
            }
            out ++= cur
          }
          t += 1
        }
        Row(row.get(0), out.toSeq, out.length)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  private[graft] def toSymbols(w: String): Seq[String] = {
    if (w.isEmpty) Seq.empty
    else {
      val cs = w.map(_.toString)
      cs.init :+ (cs.last + "</w>")
    }
  }

  private[graft] def mergeOnce(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2 // left-to-right, non-overlapping — the BPE convention
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  private def wordTable(docs: DataFrame, textCol: String): Dataset[WordFreq] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => WordFreq(toSymbols(w), f) }
      .localCheckpoint(true)
  }

  private def applyMerge(words: Dataset[WordFreq], l: String, r: String): Dataset[WordFreq] = {
    val spark = words.sparkSession
    import spark.implicits._
    words.map(w => WordFreq(mergeOnce(w.syms, l, r), w.freq))
  }
}
