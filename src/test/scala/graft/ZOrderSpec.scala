package graft

import graft.qpu.{DatastoreQpu, IndexQpu}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ZOrderSpec extends SparkSpecBase {

  test("z-order layout prunes files for 2-D box predicates where 1-D sort cannot") {
    val tmp = Files.createTempDirectory("graft-z").toString
    val events = Tables.load(spark, sf("sf0.01"), "events")

    // 1-D layout: range-partitioned + sorted by user_id only
    IndexQpu(DatastoreQpu(spark, sf("sf0.01"), "events"), "user_id")
      .materialize(s"$tmp/linear", numPartitions = 16)
    // 2-D layout: z-ordered on (user_id, value)
    IndexQpu(DatastoreQpu(spark, sf("sf0.01"), "events"), "user_id")
      .materializeZOrder(s"$tmp/zorder", "value", numPartitions = 16)

    // a 2-D box that is WIDE on user_id and NARROW on value (the top
    // ~2% slice; value spans ~0-330 with median 36): the 1-D layout
    // cannot prune on value — every file spans its full range
    val (uLo, uHi) = (0L, 149L)
    val (vLo, vHi) = (250.0, 330.0)

    def overlappingFiles(path: String): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("user_id").as("umin"), max("user_id").as("umax"),
          min("value").as("vmin"), max("value").as("vmax"))
        .filter(col("umin") <= uHi && col("umax") >= uLo &&
          col("vmin") <= vHi && col("vmax") >= vLo)
        .count()

    val linear = overlappingFiles(s"$tmp/linear")
    val zorder = overlappingFiles(s"$tmp/zorder")
    assert(linear >= 14, s"1-D layout should overlap nearly all 16 files, got $linear")
    assert(zorder * 2 <= linear,
      s"z-order must at least halve the candidate file count: $zorder vs $linear")

    // correctness: both layouts return the identical box result
    def box(path: String): Long = spark.read.parquet(path)
      .filter(col("user_id").between(uLo, uHi) && col("value").between(vLo, vHi))
      .count()
    val expected = events
      .filter(col("user_id").between(uLo, uHi) && col("value").between(vLo, vHi))
      .count()
    assert(box(s"$tmp/linear") === expected)
    assert(box(s"$tmp/zorder") === expected)
  }

  test("z-order rejects string columns with a useful message; empty input degrades") {
    val tmp = Files.createTempDirectory("graft-z2").toString
    val e = intercept[IllegalArgumentException] {
      IndexQpu(DatastoreQpu(spark, sf(), "events"), "event_type")
        .materializeZOrder(s"$tmp/bad", "value")
    }
    assert(e.getMessage.contains("event_type"))
    // empty input: plain write, no NPE from null min/max stats
    val empty = Tables.load(spark, sf(), "events").filter(col("user_id") < 0)
    IndexQpu(graft.qpu.DataFrameQpu(empty), "user_id")
      .materializeZOrder(s"$tmp/empty", "value")
    assert(spark.read.parquet(s"$tmp/empty").count() === 0)
  }
}
