package graft

import graft.model._

class TypedApiSpec extends SparkSpecBase {

  test("every table loads as its case class (schema contract)") {
    import spark.implicits._
    assert(Tables.loadAs[Region](spark, sf(), "region").count() === 5)
    assert(Tables.loadAs[Nation](spark, sf(), "nation").count() === 25)
    assert(Tables.loadAs[Customer](spark, sf(), "customer").head().c_custkey >= 0)
    assert(Tables.loadAs[Supplier](spark, sf(), "supplier").head().s_suppkey >= 0)
    assert(Tables.loadAs[Part](spark, sf(), "part").head().p_size > 0)
    assert(Tables.loadAs[Order](spark, sf(), "orders").head().o_totalprice > 0)
    assert(Tables.loadAs[Lineitem](spark, sf(), "lineitem").head().l_quantity > 0)
    assert(Tables.loadAs[Event](spark, sf(), "events").head().ts != null)
    assert(Tables.loadAs[Document](spark, sf(), "documents").head().text.nonEmpty)
    assert(Tables.loadAs[Embedding](spark, sf(), "embeddings").head().embedding.length === 64)
  }

  test("typed pipeline equals the untyped equivalent") {
    import spark.implicits._
    val typed = Tables.loadAs[Lineitem](spark, sf(), "lineitem")
      .filter(_.l_quantity >= 30.0)
      .map(li => li.l_orderkey -> li.l_extendedprice * (1 - li.l_discount))
      .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .map { case (k, v) => (k, math.round(v * 100)) }
      .collect().toMap
    val untyped = {
      import org.apache.spark.sql.functions._
      Tables.load(spark, sf(), "lineitem")
        .filter(col("l_quantity") >= 30.0)
        .groupBy("l_orderkey")
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        .collect().map(r => r.getLong(0) -> math.round(r.getDouble(1) * 100)).toMap
    }
    assert(typed === untyped)
  }
}
