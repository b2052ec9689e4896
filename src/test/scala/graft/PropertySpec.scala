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
      partKeys <- Gen.listOfN(64, Gen.choose(0, 1000000)) // >= max part count
    } yield {
      val parts = items.grouped(math.max(1, items.size / splits)).toList
      // permute the merge order with generated keys
      val shuffled = parts.zip(partKeys).sortBy(_._2).map(_._1)
      (items, k, shuffled)
    }
    // no shrinking: (items, parts) must stay a consistent partition
    check(Prop.forAllNoShrink(gen) { case (items, k, parts) =>
      val agg = new TopKAgg(k)
      // simulate partitioned reduce + a genuinely varied merge order
      // boxed input form (the aggregator now skips NULL id/score rows;
      // this property feeds non-null values only)
      val merged = parts.map(p => p.foldLeft(agg.zero)((b, x) =>
          agg.reduce(b, (java.lang.Long.valueOf(x._1), java.lang.Double.valueOf(x._2)))))
        .foldLeft(agg.zero)((a, b) => agg.merge(a, b))
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
    // fixed-seed batch: one Spark job evaluates every generated case
    // (a per-iteration forAll would launch 200 jobs); seed recorded for
    // reproducibility
    val cases = sampleN(200, gen, seed = 41L)
    val df = cases.toDF("a", "b")
    val got = df.select(graft.plans.SortedIntersectCount(col("a"), col("b"))).collect()
      .map(_.getInt(0)).toSeq
    val want = cases.map { case (a, b) => a.toSet.intersect(b.toSet).size }
    assert(got === want)
  }

  test("SimHash56 is permutation-invariant and within range") {
    import spark.implicits._
    val gen = for {
      l <- Gen.listOf(Gen.choose(0L, (1L << 56) - 1))
      keys <- Gen.listOfN(l.size, Gen.choose(0, 1000000))
    } yield (l, l.zip(keys).sortBy(_._2).map(_._1)) // seeded permutation
    val both = sampleN(200, gen, seed = 42L)
    val df = both.toDF("a", "b")
    val rows = df.select(
      graft.plans.SimHash56(col("a")).as("sa"),
      graft.plans.SimHash56(col("b")).as("sb")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) === r.getLong(1), "simhash must not depend on token order")
      assert(r.getLong(0) >= 0 && r.getLong(0) < (1L << 56))
    }
  }

  test("asofJoin equals the brute-force temporal lookup on random data") {
    import spark.implicits._
    // one dataset, many keys — each key is an independent random case
    // (ties, empty right sides, no prior match) evaluated in ONE job
    val gen = for {
      key <- Gen.choose(0L, 60L)
      t <- Gen.choose(0L, 30L)
      id <- Gen.choose(0L, 1000000L)
    } yield (key, t, id)
    val lefts = sampleN(400, gen, seed = 7L).distinct
    val rights = sampleN(400, gen, seed = 11L).distinct
    val l = lefts.toDF("k", "t", "lid")
    val r = rights.map { case (k, t, id) => (k, t, id, id * 2.0) }
      .toDF("k", "rt", "rid", "v")
    val got = graft.operators.AsOf.asofJoin(l, r, "k", "k", "t", "rt",
      rightCols = Seq("rid", "v"), rightTiebreak = Seq("rid"))
      .select("lid", "rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    val want = lefts.map { case (k, t, lid) =>
      val cands = rights.filter(rr => rr._1 == k && rr._2 <= t)
      lid -> (if (cands.isEmpty) -1L else cands.maxBy(rr => (rr._2, rr._3))._3)
    }.toMap
    assert(got === want)
  }

  test("bucketed range join equals the brute-force interval scan on random data") {
    import spark.implicits._
    val pGen = for {
      key <- Gen.choose(0L, 40L); t <- Gen.choose(0L, 200L)
      id <- Gen.choose(0L, 1000000L)
    } yield (key, t, id)
    val ivGen = for {
      key <- Gen.choose(0L, 40L); s <- Gen.choose(0L, 200L)
      len <- Gen.choose(0L, 80L); id <- Gen.choose(0L, 1000000L)
    } yield (key, s, s + len, id)
    val points = sampleN(300, pGen, seed = 13L).distinct
    val ivs = sampleN(150, ivGen, seed = 17L).distinct
    for (width <- Seq(1L, 7L, 64L, 1000L)) {
      val got = graft.operators.RangeJoin.pointInInterval(
        points.toDF("k", "t", "pid"), ivs.toDF("k", "s", "e", "ivid"),
        "k", "k", "t", "s", "e", bucketWidth = width)
        .select("pid", "ivid").collect()
        .map(x => (x.getLong(0), x.getLong(1)))
      val want = for {
        (pk, t, pid) <- points; (ik, s, e, ivid) <- ivs
        if pk == ik && t >= s && t <= e
      } yield (pid, ivid)
      assert(got.sorted.toSeq === want.sorted,
        s"width=$width: pairs must match brute force exactly (incl. multiplicity)")
    }
  }

  test("winnowing equals the brute-force windowed-minima reference on random strings") {
    import spark.implicits._
    val gen = for {
      len <- Gen.choose(0, 60)
      s <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)
    } yield s
    val texts = sampleN(120, gen, seed = 23L).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (k, w) = (3, 4)
    val got = graft.operators.Dedup.winnowFingerprints(df, "doc_id", "text", k, w)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (id, fps) => id -> fps.map(_._2).toSet }
    def hash56(s: String): Long = {
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(14)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = texts.zipWithIndex.flatMap { case (t, i) =>
      val hs = (0 to t.length - k).map(p => hash56(t.substring(p, p + k)))
      val mins =
        if (hs.isEmpty) Seq.empty
        else if (hs.size < w) Seq(hs.min)
        else hs.sliding(w).map(_.min).toSeq
      if (mins.isEmpty) None else Some(i.toLong -> mins.toSet)
    }.toMap
    assert(got === want)
  }

  test("routing mayIntersect is sound: a shared witness value implies intersection") {
    import graft.qpu._
    val valGen: Gen[Any] = Gen.oneOf(
      Gen.choose(Long.MinValue / 2, Long.MaxValue / 2).map(x => x: Any),
      Gen.choose(-1e12, 1e12).map(x => x: Any),
      Gen.alphaNumStr.map(x => x: Any))
    def predGen(attr: String): Gen[Predicate] = Gen.oneOf(
      valGen.map(Eq(attr, _)),
      Gen.zip(valGen, valGen).map { case (a, b) => Range(attr, a, b) },
      Gen.const(IsNotNull(attr)))
    // pure-Scala evaluation mirroring the Column semantics for the
    // statically-comparable cases (numbers, strings)
    def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
      case (x: Number, y: Number) =>
        Some(new java.math.BigDecimal(x.toString).compareTo(new java.math.BigDecimal(y.toString)))
      case (x: String, y: String) =>
        Some(java.util.Arrays.compareUnsigned(
          x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          y.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      case _ => None
    }
    def sat(p: Predicate, v: Any): Boolean = p match {
      case Eq(_, w) => cmp(v, w).contains(0)
      case Range(_, lb, ub) =>
        cmp(v, lb).exists(_ >= 0) && cmp(v, ub).exists(_ < 0)
      case IsNotNull(_) => true
      case IsNull(_) => false
    }
    check(Prop.forAllNoShrink(Gen.zip(predGen("a"), predGen("a"), valGen)) {
      case (p, q, v) =>
        // soundness only: a witness satisfying both must not be pruned
        !(sat(p, v) && sat(q, v)) || Predicates.mayIntersect(p, q)
    })
  }

  /** Deterministic batch sampling with an explicit seed (reproducible
    * without ScalaCheck's runner).
    */
  private def sampleN[T](n: Int, gen: Gen[T], seed: Long): List[T] = {
    val params = Gen.Parameters.default
    Iterator.iterate(org.scalacheck.rng.Seed(seed))(_.next)
      .map(s => gen.apply(params, s))
      .collect { case Some(v) => v }
      .take(n).toList
  }
}
