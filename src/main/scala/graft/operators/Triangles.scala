package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting by degree-ordered orientation — the join-based
  * algorithm whose intermediate (the wedge set) is bounded by graph
  * arboricity instead of the quadratic hub blow-up of the naive
  * a<b<c three-way join: every undirected edge is oriented from its
  * lower-(degree, id) endpoint to the higher, so a node's out-degree
  * is O(√E) and each triangle is counted exactly once, as the wedge
  * at its minimum-order vertex closed by the oriented third edge.
  *
  * Scale shape: dedup + degree are combinable aggregations; the wedge
  * build is ONE self-join of the oriented edge list on `u` (shuffle
  * on the wedge apex), and the close is one join on the (x, y) pair.
  * Degrees ride the edge list as plain columns — the order key
  * `deg·1e8 + id` is scalar arithmetic (ids must be < 1e8), so the
  * orientation never joins against a rank table per comparison.
  */
object Triangles {

  /** Total triangle count of the undirected simple graph induced by
    * `edges` (duplicates and self-loops dropped). One row:
    * `n_triangles`.
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("dg"))
    val ka = col("da") * 100000000L + col("a")
    val kb = col("db") * 100000000L + col("b")
    val oriented = und
      .join(deg.select(col("id").as("a"), col("dg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("dg").as("db")), "b")
      .select(
        when(ka < kb, col("a")).otherwise(col("b")).as("u"),
        when(ka < kb, col("b")).otherwise(col("a")).as("v"),
        when(ka < kb, kb).otherwise(ka).as("kv"))
      .persist()
    // materialize BEFORE the triple self-reference below: the wedge
    // join's two sides and the closing join otherwise race to fill the
    // cache concurrently inside one job and re-execute the whole
    // edge-build upstream per side (the PageRank lazy-persist lesson)
    oriented.count()
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.kv") < col("e2.kv"))
      .select(col("e1.v").as("x"), col("e2.v").as("y"))
    wedges.join(oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
