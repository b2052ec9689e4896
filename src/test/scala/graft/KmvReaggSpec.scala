package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class KmvReaggSpec extends SparkSpecBase {

  test("kmvReaggregate == direct kmvDistinct (bottom-k closure under merge)") {
    import spark.implicits._
    // 3 groups x 40 buckets x values with heavy cross-bucket overlap,
    // cardinalities straddling k=16 (exact below, estimated above)
    val rows = for {
      g <- Seq("a", "b", "c")
      b <- 0 until 40
      i <- 0 until (if (g == "a") 2 else 30)
    } yield (g, b, s"$g-v${(b * 7 + i * 13) % (if (g == "a") 10 else 400)}")
    val df = rows.toDF("grp", "bucket", "v")
    val merged = Sketches.kmvReaggregate(df, Seq("grp"), col("bucket"), "v", k = 16)
      .select("grp", "est_distinct")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Sketches.kmvDistinct(df, Seq("grp"), "v", k = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === direct)
    // group a is below k: exact
    assert(merged("a") === 10L)
  }

  test("sampledMedianReaggregate == direct sampledMedian (total-order bottom-k closure)") {
    import spark.implicits._
    // groups straddling k=16: exact below, sampled above, heavy
    // duplicate values to exercise score/value ties at the boundary
    val rows = for {
      g <- Seq("a", "b")
      i <- 0 until (if (g == "a") 12 else 300)
    } yield (g, i.toLong + (if (g == "a") 0 else 1000), (i % 7).toLong, i % 16)
    val df = rows.toDF("grp", "id", "v", "shard")
    val merged = Sketches.sampledMedianReaggregate(df, "grp", col("shard"), "id", "v", k = 16)
      .collect().map(r => r.getString(0) -> (r.getInt(2), r.getLong(3))).toMap
    val direct = Sketches.sampledMedian(df, "grp", "id", "v", k = 16)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(merged === direct)
    assert(merged("a")._1 === 12) // below k: the whole group, median exact
  }

  test("kmvReaggregate: n_buckets counts sub-sketches; nulls carry no signal") {
    import spark.implicits._
    val df = Seq(("g", 1, "x"), ("g", 1, "y"), ("g", 2, "x"), ("g", 3, null))
      .toDF("grp", "bucket", "v")
    val out = Sketches.kmvReaggregate(df, Seq("grp"), col("bucket"), "v", k = 8)
      .collect().head
    assert(out.getAs[Long]("n_buckets") === 2L) // bucket 3 held only a null
    assert(out.getAs[Long]("est_distinct") === 2L)
  }
}
