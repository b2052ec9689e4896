package graft

import graft.functions.TopKAgg
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

/** Property-based checks for the hand-written kernels — the places a
  * unit example can miss an edge (ties, NaN, empty, odd sizes).
  */
class PropertySpec extends SparkSpecBase {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("TopKAgg equals sort-take for any input, any partition merge order") {
    val gen = for {
      n <- Gen.choose(0, 60)
      items <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 20L),
        Gen.oneOf(Gen.choose(-5.0, 5.0), Gen.const(Double.NaN))))
      k <- Gen.choose(1, 8)
      splits <- Gen.choose(1, 5)
      partKeys <- Gen.listOfN(splits + 1, Gen.choose(0, 1000000))
    } yield {
      val parts = items.grouped(math.max(1, items.size / splits)).toList
      // permute the merge order with generated (seeded, shrinkable) keys
      val shuffled = parts.zipAll(partKeys.take(parts.size), Nil, 0)
        .sortBy(_._2).map(_._1)
      (items, k, shuffled)
    }
    check(Prop.forAll(gen) { case (items, k, parts) =>
      val agg = new TopKAgg(k)
      // simulate partitioned reduce + a genuinely varied merge order
      val merged = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      // reference: total order (score desc NaN-last, id asc), take k
      def key(t: (Long, Double)) =
        (if (t._2.isNaN) 1 else 0, -t._2, t._1)
      val ref = items.sortBy(key)(
        Ordering.Tuple3(Ordering.Int, Ordering.Double.TotalOrdering, Ordering.Long)).take(k)
      val got = agg.finish(merged)
      (got.map(_._1) == ref.map(_._1)) :| s"got $got, want $ref"
    })
  }

  test("SortedIntersectCount equals set intersection for random long sets") {
    import spark.implicits._
    val gen = for {
      a <- Gen.listOf(Gen.choose(0L, 50L)).map(_.distinct.sorted)
      b <- Gen.listOf(Gen.choose(0L, 50L)).map(_.distinct.sorted)
    } yield (a, b)
    // property runs through forAll (seeded, shrinking); Spark evaluates
    // each counterexample candidate through the native kernel
    check(Prop.forAll(Gen.listOfN(12, gen)) { cases =>
      val df = cases.toDF("a", "b")
      val got = df.select(graft.plans.SortedIntersectCount(col("a"), col("b"))).collect()
        .map(_.getInt(0)).toSeq
      val want = cases.map { case (a, b) => a.toSet.intersect(b.toSet).size }
      (got == want) :| s"got $got, want $want"
    })
  }

  test("SimHash56 is permutation-invariant and within range") {
    import spark.implicits._
    val gen = for {
      l <- Gen.listOf(Gen.choose(0L, (1L << 56) - 1))
      keys <- Gen.listOfN(l.size, Gen.choose(0, 1000000))
    } yield (l, l.zip(keys).sortBy(_._2).map(_._1)) // seeded permutation
    check(Prop.forAll(Gen.listOfN(10, gen)) { both =>
      val df = both.toDF("a", "b")
      val rows = df.select(
        graft.plans.SimHash56(col("a")).as("sa"),
        graft.plans.SimHash56(col("b")).as("sb")).collect()
      rows.forall { r =>
        r.getLong(0) == r.getLong(1) && r.getLong(0) >= 0 && r.getLong(0) < (1L << 56)
      } :| "simhash must be order-invariant and 56-bit"
    })
  }
}
