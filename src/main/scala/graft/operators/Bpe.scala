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

  /** Tokenize the corpus with a learned merge table — word-internal,
    * so a pure map over the corpus scan (zero shuffle); the merge
    * list is a small driver-side constant shipped in the task
    * closure. Zero-token docs (NULL or whitespace-only text) emit
    * (empty array, 0) — pinned in BpeSpec and mirrored by the
    * oracle's LEFT JOIN.
    *
    * Kernel shape: `mapPartitions` with per-PARTITION scratch reused
    * across every word, so the corpus-sized hot path allocates only
    * its output rows. The per-word algorithm is the standard
    * rank-priority-queue encode — a doubly-linked symbol list plus a
    * min-heap of (rank, position) candidates with lazy invalidation:
    * O(len · log len) per word INDEPENDENT of merge-table size,
    * where the per-rank rescan this replaced cost O(merges · len)
    * (3 orders of magnitude more scans at a production 32k-merge
    * vocabulary). Heap order (rank, then leftmost position)
    * reproduces the pinned rank-order left-to-right-non-overlapping
    * semantics exactly WHEN the merge table is well-formed
    * ([[wellFormed]]: every composite component is the output of an
    * earlier rule and rule outputs are distinct — true of any
    * [[train]]-produced table); a malformed table (where the two
    * algorithms genuinely diverge: a late merge can manufacture a
    * symbol an EARLier rule consumes, which rank-order replay never
    * applies but lowest-rank-first would) falls back to the rescan so
    * the documented semantics never silently change.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame =
    encode(docs, idCol, textCol, merges, forceRescan = false)

  /** `forceRescan` pins the reference path for the equivalence spec
    * (BpeSpec proves heap == rescan over real corpora); production
    * callers never set it.
    */
  private[graft] def encode(docs: DataFrame, idCol: String, textCol: String,
                            merges: Seq[(String, String)],
                            forceRescan: Boolean): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val in = docs.select(col(idCol), col(textCol))
    val outSchema = StructType(Seq(
      in.schema.head,
      StructField("bpe_tokens", ArrayType(StringType, containsNull = false), nullable = false),
      StructField("n_bpe", IntegerType, nullable = false)))
    val mArr = merges.toArray
    val useHeap = !forceRescan && wellFormed(merges)
    in.mapPartitions { rows =>
      val enc = if (useHeap) new HeapEncoder(mArr) else new RescanEncoder(mArr)
      val out = new scala.collection.mutable.ArrayBuffer[String](256)
      rows.map { row =>
        out.clear()
        val text = if (row.isNullAt(1)) "" else row.getString(1)
        val toks = text.trim.split("\\s+")
        var t = 0
        while (t < toks.length) {
          if (toks(t).nonEmpty) enc.encodeWord(toks(t), out)
          t += 1
        }
        Row(row.get(0), out.toSeq, out.length)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** A merge table is well-formed when every composite (non-base)
    * component of rule i is the output `l+r` of some EARLIER rule and
    * no two rules produce the same output string. Under those two
    * conditions a merge at rank m can only ever enable pairs of rank
    * > m (the new symbol's unique producer is m itself), so the
    * lowest-rank-first heap replay and the rank-order rescan replay
    * are provably identical. Any table [[train]] emits satisfies both
    * by construction; hand-written tables are checked, not trusted.
    * Base symbols are a single character or a single character +
    * `</w>`.
    */
  private[graft] def wellFormed(merges: Seq[(String, String)]): Boolean = {
    def atomic(s: String): Boolean =
      s.length == 1 || (s.endsWith("</w>") && s.length == 5)
    val outputs = scala.collection.mutable.HashMap.empty[String, Int]
    val ok = merges.zipWithIndex.forall { case ((l, r), i) =>
      val lOk = atomic(l) || outputs.get(l).exists(_ < i)
      val rOk = atomic(r) || outputs.get(r).exists(_ < i)
      outputs.put(l + r, outputs.getOrElse(l + r, i)) // first producer wins
      lOk && rOk
    }
    // distinct outputs: a duplicate output string breaks the
    // unique-producer argument (and covers duplicate (l, r) rules,
    // whose re-application at the later rank the heap would not replay)
    ok && merges.map { case (l, r) => l + r }.distinct.size == merges.size
  }

  private sealed trait WordEncoder {
    def encodeWord(w: String, out: scala.collection.mutable.ArrayBuffer[String]): Unit
    /** Split `w` into base symbols in `syms`, return count. Symbols
      * are Unicode CODE POINTS, not UTF-16 chars (fuzz r12): charAt
      * would split a non-BMP character (emoji, rare CJK) into two
      * lone surrogates — invalid strings the SQL oracle (which slices
      * per character) can never produce.
      */
    protected final def baseSyms(w: String, syms: Array[String]): Int = {
      var i = 0
      var n = 0
      while (i < w.length) {
        val l = Character.charCount(w.codePointAt(i))
        syms(n) = w.substring(i, i + l)
        n += 1
        i += l
      }
      if (n > 0) syms(n - 1) = syms(n - 1) + "</w>"
      n
    }
  }

  /** O(merges × len) reference replay: for each rank in order, one
    * left-to-right non-overlapping sweep. Kept as the semantics
    * definition (the oracle replays exactly this) and the fallback
    * for malformed tables.
    */
  private final class RescanEncoder(mArr: Array[(String, String)]) extends WordEncoder {
    private var cur = new scala.collection.mutable.ArrayBuffer[String](64)
    private var nxt = new scala.collection.mutable.ArrayBuffer[String](64)
    def encodeWord(w: String, out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
      cur.clear()
      var i = 0
      while (i < w.length) { // code-point split, same contract as baseSyms
        val l = Character.charCount(w.codePointAt(i))
        cur += w.substring(i, i + l)
        i += l
      }
      if (cur.nonEmpty) cur(cur.length - 1) = cur(cur.length - 1) + "</w>"
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
  }

  /** O(len · log len) heap encode: doubly-linked symbol list over the
    * base symbols; a long-packed (rank, pos) min-heap of candidate
    * adjacent pairs with lazy invalidation (a popped entry re-checks
    * the CURRENT pair at its position — consumed or changed pairs are
    * skipped; their live replacement has its own entry). All scratch
    * (linked list, heap, rank map) is per-partition and reused across
    * words; nothing allocates per merge.
    */
  private final class HeapEncoder(mArr: Array[(String, String)]) extends WordEncoder {
    private val rank = {
      val m = new java.util.HashMap[String, Integer](mArr.length * 2)
      var i = 0
      while (i < mArr.length) {
        // first (lowest) rank wins on duplicate pairs, matching rescan
        m.putIfAbsent(mArr(i)._1 + " " + mArr(i)._2, Integer.valueOf(i))
        i += 1
      }
      m
    }
    private var syms = new Array[String](64)
    private var nxt = new Array[Int](64)
    private var prv = new Array[Int](64)
    private var heap = new Array[Long](64)
    private var heapN = 0

    private def rankOf(a: String, b: String): Int = {
      val r = rank.get(a + " " + b)
      if (r == null) -1 else r.intValue()
    }
    private def push(v: Long): Unit = {
      if (heapN == heap.length) heap = java.util.Arrays.copyOf(heap, heap.length * 2)
      heap(heapN) = v; heapN += 1
      var c = heapN - 1
      while (c > 0 && heap((c - 1) / 2) > heap(c)) {
        val p = (c - 1) / 2
        val t = heap(p); heap(p) = heap(c); heap(c) = t
        c = p
      }
    }
    private def pop(): Long = {
      val top = heap(0)
      heapN -= 1
      heap(0) = heap(heapN)
      var p = 0
      while (true) {
        val l = 2 * p + 1; val r = l + 1
        var s = p
        if (l < heapN && heap(l) < heap(s)) s = l
        if (r < heapN && heap(r) < heap(s)) s = r
        if (s == p) return top
        val t = heap(p); heap(p) = heap(s); heap(s) = t
        p = s
      }
      top
    }

    def encodeWord(w: String, out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
      val n = w.length
      if (syms.length < n) {
        val cap = Integer.highestOneBit(n - 1) * 2
        syms = new Array[String](cap); nxt = new Array[Int](cap); prv = new Array[Int](cap)
      }
      val cnt = baseSyms(w, syms)
      var i = 0
      while (i < cnt) { nxt(i) = if (i + 1 < cnt) i + 1 else -1; prv(i) = i - 1; i += 1 }
      heapN = 0
      i = 0
      while (i + 1 < cnt) {
        val r = rankOf(syms(i), syms(i + 1))
        if (r >= 0) push(r.toLong << 32 | i.toLong)
        i += 1
      }
      while (heapN > 0) {
        val top = pop()
        val rk = (top >>> 32).toInt
        val p = (top & 0xffffffffL).toInt
        if (syms(p) != null) {
          val q = nxt(p)
          // lazy invalidation: merge only if the pair at p is STILL
          // this entry's pair (same rank); a changed pair's live rank
          // has its own, earlier-or-later entry
          if (q >= 0 && rankOf(syms(p), syms(q)) == rk) {
            syms(p) = syms(p) + syms(q)
            syms(q) = null
            val qn = nxt(q)
            nxt(p) = qn
            if (qn >= 0) prv(qn) = p
            val pp = prv(p)
            if (pp >= 0) {
              val r2 = rankOf(syms(pp), syms(p))
              if (r2 >= 0) push(r2.toLong << 32 | pp.toLong)
            }
            if (qn >= 0) {
              val r2 = rankOf(syms(p), syms(qn))
              if (r2 >= 0) push(r2.toLong << 32 | p.toLong)
            }
          }
        }
      }
      // node 0 is never a merge's right operand, so the chain from 0
      // visits exactly the live symbols in order
      i = 0
      while (i >= 0) { out += syms(i); i = nxt(i) }
    }
  }

  private[graft] def toSymbols(w: String): Seq[String] = {
    if (w.isEmpty) Seq.empty
    else {
      // code points, not UTF-16 chars — see baseSyms (fuzz r12)
      val cs = w.codePoints().toArray.toIndexedSeq
        .map(cp => new String(Character.toChars(cp)))
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
