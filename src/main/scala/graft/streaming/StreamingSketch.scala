package graft.streaming

import graft.functions.KMinAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming sketches over unbounded inputs — state bounded by the
  * sketch size, never by the stream's cardinality.
  */
object StreamingSketch {

  /** Continuous per-group distinct-count estimation: the KMV bottom-k
    * sketch maintained as `mapGroupsWithState` state. Each micro-batch
    * folds its md5-derived 56-bit value hashes into the group's k
    * sorted minima (the SAME [[KMinAgg.insert]]/[[KMinAgg.estimate]]
    * kernel as the batch aggregator, so a streaming estimate equals
    * the batch estimate over the same prefix of the stream) and emits
    * the updated estimate.
    *
    * State per group is k longs — a few hundred bytes however many
    * distinct values flow past, which is the whole point: exact
    * streaming distinct needs unbounded state and a blocking output
    * mode, the sketch needs neither. Run with output mode `update`.
    */
  def streamingKmvDistinct(stream: DataFrame, groupCol: String,
                           valueCol: String, k: Int = 64): DataFrame = {
    require(k >= 2 && k <= 128, s"kmv k must be in [2, 128], got $k")
    val spark = stream.sparkSession
    import spark.implicits._
    // the state key rides as a string (one concrete encoder for any
    // group type); cast back to the input column's type on the way
    // out so the streaming schema matches batch kmvDistinct's — a
    // caller unioning the two must not hit a long-vs-string mismatch
    val groupType = stream.schema(groupCol).dataType
    stream
      .filter(col(valueCol).isNotNull) // NULLs carry no cardinality signal
      .select(col(groupCol).cast("string").as("g"),
        conv(substring(md5(col(valueCol).cast("string")), 1, 14), 16, 10)
          .cast("long").as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Seq[Long], (String, Long)](GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          val merged = rows.foldLeft(state.getOption.getOrElse(Seq.empty[Long])) {
            (buf, r) => KMinAgg.insert(buf, r._2, k)
          }
          state.update(merged)
          (key, KMinAgg.estimate(merged, k))
      }
      .toDF(groupCol, "est_distinct")
      .withColumn(groupCol, col(groupCol).cast(groupType))
  }
}
