package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions.
  *
  * At 100 TB a handful of hot keys (the "null user", the viral story)
  * turn a shuffle join into one straggler task. AQE's skew-join split
  * handles sort-merge spills, but when the hot side must be *joined*,
  * salting is the general fix: the skewed (large) side gets a random
  * salt in [0, saltFactor); the build (smaller) side is replicated
  * saltFactor times; the join key becomes (key, salt), spreading each
  * hot key over saltFactor tasks. Results are identical to the plain
  * join.
  */
object SkewJoin {

  def saltedJoin(large: DataFrame, small: DataFrame,
                 largeKey: String, smallKey: String,
                 saltFactor: Int = 8): DataFrame = {
    val salted = large.withColumn("__salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
        salted(largeKey) === replicated(smallKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Diagnostic: top-k heaviest keys with their share of the table —
    * the thing to look at before deciding between broadcast, salt, or
    * filter-out.
    */
  def keySkew(df: DataFrame, key: Column, k: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
      .withColumn("share", col("cnt") / lit(total.toDouble))
      .orderBy(col("cnt").desc)
      .limit(k)
  }
}
