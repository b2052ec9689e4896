package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF weighting over a document corpus — the standard feature
  * transform feeding retrieval / quality scoring in a training-data
  * pipeline.
  *
  * Scale shape: one explode + two hash aggregations; the document
  * frequency table is vocabulary-sized, so it broadcasts back onto the
  * term-frequency table (no fact-side shuffle for the final join).
  */
object TfIdf {

  /** Per (doc, token): term count, document frequency, and
    * `tf * ln(N / df)`.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf_cnt"))
    val df = tok.groupBy("token").agg(countDistinct("doc_id").as("df_cnt"))
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    tf.join(broadcast(df), "token")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("token"), col("tf_cnt"), col("df_cnt"),
        (col("tf_cnt") * log(col("n_docs") / col("df_cnt"))).as("tfidf"))
  }

  /** Unigram surprisal per document: `avg(-ln p(token))` under the
    * corpus's own unigram distribution — the cheap stand-in for the
    * LM-perplexity quality filter (CCNet-style): documents full of
    * rare tokens (noise, mojibake, code dumps) score high, fluent
    * common-word text scores low.
    *
    * Scale shape mirrors [[tfidf]]: one explode, one vocabulary-sized
    * frequency table broadcast back onto the token stream, one
    * map-side-combinable per-doc aggregation. No UDFs.
    */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val freq = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = freq.select(sum("cnt").as("total"))
    tok.join(broadcast(freq), "token")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        avg(-log(col("cnt") / col("total"))).as("avg_surprisal"))
  }
}
