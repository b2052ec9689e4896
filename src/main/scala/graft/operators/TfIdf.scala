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
}
