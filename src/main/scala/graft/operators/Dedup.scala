package graft.operators

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline, in
  * increasing fuzziness: exact hash → normalized fingerprint →
  * bucketed Jaccard → MinHash+LSH → SimHash.
  *
  * Scale design: nothing here ever does an all-pairs comparison.
  * Candidate generation is always a shuffle keyed by a bucket (content
  * hash, LSH band, simhash chunk), so the only quadratic work happens
  * inside buckets whose size the banding parameters bound. All hashes
  * are md5-derived (HashFunctions) → engine-portable and oracle-checkable.
  */
object Dedup {

  /** Exact dedup: group by content hash, elect the smallest id as
    * canonical. One map-side-combined shuffle on the hash.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(HashFunctions.contentHash(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_cnt"))

  /** Fingerprint dedup: as exact, but on the normalized fingerprint
    * (lower-case, whitespace-collapsed) so trivial edits collapse.
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextFunctions.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_cnt"))

  /** Word-set Jaccard near-dup pairs within a pre-existing bucket
    * column (e.g. source/domain). Emits integer intersection/union
    * sizes; `jaccard >= num/den` is checked as exact integer math
    * (`inter*den >= union*num`). The bucket join is a shuffle on
    * `bucketCol`; pairs only form inside buckets.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   bucketCol: String, num: Int, den: Int): DataFrame = {
    val t = df.select(col(idCol).as("id"), col(bucketCol).as("bucket"),
      TextFunctions.tokenSet(col(textCol)).as("toks"))
    val a = t.as("a"); val b = t.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        size(array_intersect(col("a.toks"), col("b.toks"))).as("inter_size"),
        size(array_union(col("a.toks"), col("b.toks"))).as("union_size"))
      .filter(col("inter_size") * den >= col("union_size") * num)
  }

  /** MinHash signature: `numHashes` independent md5-derived hash
    * families, min over the distinct-token set.
    */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
                       numHashes: Int): DataFrame = {
    val toks = TextFunctions.tokenSet(col(textCol))
    val sig = (0 until numHashes).map { i =>
      array_min(transform(toks, w => HashFunctions.seededHash56(i, w))).as(s"m$i")
    }
    df.select((col(idCol).as("id") +: sig): _*)
  }

  /** MinHash + banded LSH + exact-Jaccard confirmation.
    *
    * Candidates: ids sharing all `rowsPerBand` minhashes of at least
    * one band (shuffle keyed by (band, band-signature) — never
    * all-pairs). Confirmation: true word-set Jaccard >= num/den on the
    * candidates only (standard LSH-then-verify; with a small vocab the
    * candidate set alone is meaninglessly dense).
    *
    * Output: (doc_a, doc_b, inter_size, union_size) — integers only.
    */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
                   bands: Int, rowsPerBand: Int,
                   num: Int, den: Int): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigs = minhashSignature(df, idCol, textCol, numHashes)
    val bandKeys = (0 until bands).map { bnd =>
      val parts = (0 until rowsPerBand).map(r => col(s"m${bnd * rowsPerBand + r}"))
      struct(lit(bnd).as("band"), concat_ws("_", parts: _*).as("sig"))
    }
    val exploded = sigs.select(col("id"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
    val cand = exploded.as("a")
      .join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    val toks = df.select(col(idCol).as("id"),
      TextFunctions.tokenSet(col(textCol)).as("toks"))
    cand
      .join(toks.withColumnRenamed("id", "doc_a").withColumnRenamed("toks", "toks_a"), "doc_a")
      .join(toks.withColumnRenamed("id", "doc_b").withColumnRenamed("toks", "toks_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("toks_a"), col("toks_b"))).as("inter_size"),
        size(array_union(col("toks_a"), col("toks_b"))).as("union_size"))
      .filter(col("inter_size") * den >= col("union_size") * num)
  }

  /** 56-bit SimHash over the distinct-token set: bit b is set when
    * more than half the token hashes have bit b set. Pure SQL
    * expression (shiftleft with a column shift), stays in codegen.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFunctions.tokenSet(col(textCol))
    val hashes = transform(toks, w => HashFunctions.seededHash56(0, w))
    df.select(col(idCol).as("id"), hashes.as("th"))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 55), 0L, (acc, b) ->
          |  acc + IF(2 * size(filter(th, h -> (h div shiftleft(1L, b)) % 2 = 1)) > size(th),
          |           shiftleft(1L, b), 0L))""".stripMargin))
      .select(col("id"), col("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming.
    * Pigeonhole banding: 56 bits in 4 chunks of 14; pairs must share
    * one exact chunk (bounds candidates), then exact popcount(xor)
    * filters. Shuffle keyed by (chunk index, chunk value).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    val sims = simhash(df, idCol, textCol)
    val chunks = sims.select(col("id"), col("simhash"),
      explode(expr("transform(sequence(0, 3), c -> struct(c AS chunk, (simhash div shiftleft(1L, c * 14)) % 16384 AS v))")).as("ck"))
      .select(col("id"), col("simhash"), col("ck.chunk").as("chunk"), col("ck.v").as("v"))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
