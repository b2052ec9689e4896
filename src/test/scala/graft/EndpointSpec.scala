package graft

import java.sql.DriverManager

import org.apache.hive.service.server.HiveServer2
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
import org.scalatest.BeforeAndAfterAll

import graft.metrics.{MetricsRegistry, MetricsService}

/** The network-client surface (reference parity:
  * pkg/proteus-go-client/proteus_client.go:56 `Query(queryStmt)` over
  * gRPC, and :82 `GetMetrics`): an APPLICATION must be able to query
  * the deployed graph — and read its latency metrics — over the wire
  * with a stock client. Here that's HiveServer2's Thrift protocol:
  * `HiveThriftServer2.startWithSparkSession` on the session that
  * carries graft's SQL-named kernels and metrics views, and a plain
  * `java.sql.DriverManager` + hive-jdbc client on the other side. The
  * client side of this spec touches NO graft classes — everything it
  * uses is the SQL surface the extensions registered, exactly what a
  * BI tool or service would see.
  */
class EndpointSpec extends SparkSpecBase with BeforeAndAfterAll {

  // the HiveThriftServer2 CLASS is private[hive]; hold the public base
  private var server: HiveServer2 = _
  private var port: Int = _
  private def url = s"jdbc:hive2://localhost:$port/default"

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.plans.GraftExtensions.register(spark)
    MetricsService.register(spark)
    Tables.registerAll(spark, sf())
    port = { val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    spark.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    spark.sqlContext.setConf("hive.server2.thrift.bind.host", "localhost")
    // in-process server over THIS session's catalog + extensions
    server = HiveThriftServer2.startWithSparkSession(spark, exitOnError = false)
    // the thrift layer binds asynchronously; poll until it accepts
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var up = false
    while (!up && System.nanoTime() < deadline) {
      try { new java.net.Socket("localhost", port).close(); up = true }
      catch { case _: java.io.IOException => Thread.sleep(200) }
    }
    assert(up, s"thrift endpoint never came up on $port")
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop()
    // startWithSparkSession turns on the java8 datetime API for the
    // session (Instant instead of java.sql.Timestamp in collected
    // rows); with singleSession that mutation outlives the server and
    // breaks later suites' Row.getTimestamp — put it back
    spark.conf.set("spark.sql.datetime.java8API.enabled", "false")
    super.afterAll()
  }

  test("a pure-JDBC client runs graft kernels by SQL name over the wire") {
    val conn = DriverManager.getConnection(url, "graft", "")
    try {
      val st = conn.createStatement()
      // scalar kernel round-trip
      val r1 = st.executeQuery(
        "SELECT cosine_sim(array(cast(3.0 AS float), cast(4.0 AS float)), " +
        "array(cast(3.0 AS float), cast(4.0 AS float))) AS cs")
      assert(r1.next() && math.abs(r1.getDouble("cs") - 1.0) < 1e-9)
      // corpus query through the endpoint == the same SQL in-process
      val sql =
        """SELECT doc_id, element_at(minhash_sig(split(text, '\\s+'), 4), 1) AS m0
          |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin
      val rs = st.executeQuery(sql)
      val wire = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => (r.getLong(1), r.getLong(2))).toVector
      val local = spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).toVector
      assert(wire.nonEmpty && wire === local,
        s"wire=${wire.take(3)}... local=${local.take(3)}...")
    } finally conn.close()
  }

  test("the optimizer extension is active for wire queries too") {
    val conn = DriverManager.getConnection(url, "graft", "")
    try {
      // SelfIntersectFold rewrites sorted_intersect_count(x, x) → size(x);
      // EXPLAIN through the endpoint proves the injected rule runs there.
      // A COLUMN argument keeps constant folding out of the picture (a
      // literal arg would collapse to a literal with or without our rule)
      val rs = conn.createStatement().executeQuery(
        "EXPLAIN SELECT sorted_intersect_count(a, a) FROM " +
        "(SELECT array(doc_id, doc_id) AS a FROM documents)")
      val plan = Iterator.continually(rs).takeWhile(_.next()).map(_.getString(1)).mkString("\n")
      // the output attribute keeps its auto-alias "sorted_intersect_count(a, a)",
      // so assert on the rewritten projection EXPRESSION, not name absence
      assert(plan.contains("size("), s"SelfIntersectFold missing from wire plan:\n$plan")
    } finally conn.close()
  }

  test("query metrics percentiles are retrievable via SQL (GetMetrics parity), and stay fresh") {
    MetricsRegistry.clear()
    MetricsService.record(spark, "lineitem_count") {
      spark.sql("SELECT count(*) FROM lineitem").collect()
    }
    val conn = DriverManager.getConnection(url, "graft", "")
    try {
      val st = conn.createStatement()
      val rs = st.executeQuery(
        "SELECT name, n_queries, p50_ms, p99_ms, records FROM graft_metrics_summary " +
        "WHERE name = 'lineitem_count'")
      assert(rs.next(), "recorded query missing from graft_metrics_summary")
      assert(rs.getLong("n_queries") === 1L)
      assert(rs.getDouble("p50_ms") >= 0.0 && rs.getDouble("p99_ms") >= rs.getDouble("p50_ms"))
      assert(rs.getLong("records") > 0L, "task-level input records should be visible")
      // freshness: a SECOND record lands in the NEXT wire read with no
      // refresh call — the V2 scan re-snapshots at planning time
      MetricsService.record(spark, "lineitem_count") {
        spark.sql("SELECT count(*) FROM lineitem").collect()
      }
      val rs2 = st.executeQuery(
        "SELECT n_queries FROM graft_metrics_summary WHERE name = 'lineitem_count'")
      assert(rs2.next() && rs2.getLong("n_queries") === 2L,
        "second recorded query must appear without any view refresh")
    } finally conn.close()
  }

  test("per-operator plan metrics are retrievable via SQL (tracer parity)") {
    import graft.metrics.PlanMetricsRegistry
    PlanMetricsRegistry.clear()
    // a query that SHUFFLES: the served plan must surface an Exchange
    // node whose shuffle-bytes metric a plain JDBC client can read —
    // the per-stage picture you actually need when one stage of a
    // 100 TB job is slow
    MetricsService.recordPlan(spark, "orders_by_priority")(
      spark.sql("SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS tot " +
        "FROM orders GROUP BY o_orderpriority"))
    val conn = DriverManager.getConnection(url, "graft", "")
    try {
      val st = conn.createStatement()
      val rs = st.executeQuery(
        "SELECT node_name, metric_name, value FROM graft_plan_metrics " +
        "WHERE name = 'orders_by_priority' AND node_name LIKE '%Exchange%' " +
        "AND metric_name LIKE '%bytes written%'")
      assert(rs.next(), "shuffling query must yield an Exchange row in graft_plan_metrics")
      assert(rs.getLong("value") > 0L, "exchange bytes must be nonzero")
      // the scan side is there too, with its row count
      val rs2 = st.executeQuery(
        "SELECT sum(value) AS rows FROM graft_plan_metrics " +
        "WHERE name = 'orders_by_priority' AND node_name LIKE '%Scan%' " +
        "AND metric_name = 'number of output rows'")
      assert(rs2.next() && rs2.getLong("rows") > 0L,
        "scan numOutputRows missing from the per-operator breakdown")
    } finally conn.close()
  }

  test("a streaming materialized view's mid-stream upserts are visible to one JDBC connection") {
    import graft.streaming.Subscribe
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-endpoint")
    val path = s"$dir/mv"
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, Long)]
    val stream = input.toDF().toDF("key", "ts", "amount")
      .withColumn("part", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("key"), org.apache.spark.sql.functions.lit(4)))
    val q = Subscribe.parquetUpsertSink(stream, path, s"$dir/ckpt",
      key = Seq("key"), tsCol = "ts", tiebreak = Seq("amount"), partitionCol = "part")
    try {
      val ts = (s: String) => java.sql.Timestamp.valueOf(s)
      input.addData((1L, ts("2024-01-01 10:00:00"), 100L), (2L, ts("2024-01-01 10:00:00"), 200L))
      q.processAllAvailable()
      // ONE connection observes the view across upserts — the internal-
      // parity path: reference QPUs push State/Delta to subscribers;
      // here the materialized state is a parquet table the endpoint
      // serves, and a re-query sees the newest upsert. Client side is
      // pure SQL: path-table syntax + REFRESH (the one statement any
      // engine needs after an external writer changes files).
      val conn = DriverManager.getConnection(url, "graft", "")
      try {
        val st = conn.createStatement()
        def readAll(): Map[Long, Long] = {
          st.execute(s"""REFRESH "$path"""")
          val rs = st.executeQuery(s"SELECT key, amount FROM parquet.`$path`")
          Iterator.continually(rs).takeWhile(_.next())
            .map(r => r.getLong(1) -> r.getLong(2)).toMap
        }
        assert(readAll() === Map(1L -> 100L, 2L -> 200L))
        // mid-stream: key 1 is upserted to a newer version, key 3 arrives
        input.addData((1L, ts("2024-01-01 11:00:00"), 150L), (3L, ts("2024-01-01 11:00:00"), 300L))
        q.processAllAvailable()
        assert(readAll() === Map(1L -> 150L, 2L -> 200L, 3L -> 300L),
          "the same connection must see the upsert on re-query, no reconnect")
      } finally conn.close()
    } finally q.stop()
  }

  test("two concurrent JDBC sessions run kernels + metrics queries without interference") {
    import java.util.concurrent.{Executors, TimeUnit}
    MetricsRegistry.clear()
    MetricsService.record(spark, "concurrent_probe") {
      spark.sql("SELECT count(*) FROM lineitem").collect()
    }
    val pool = Executors.newFixedThreadPool(2)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    (1 to 2).foreach { _ =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            val conn = DriverManager.getConnection(url, "graft", "")
            try {
              val st = conn.createStatement()
              (1 to 5).foreach { _ =>
                // kernel SQL…
                val r = st.executeQuery(
                  "SELECT sum(element_at(minhash_sig(split(text, '\\\\s+'), 4), 1)) AS s " +
                  "FROM documents WHERE doc_id < 50")
                assert(r.next()); results.add(r.getLong(1))
                // …interleaved with metrics reads on the same connection
                val m = st.executeQuery(
                  "SELECT n_queries FROM graft_metrics_summary WHERE name = 'concurrent_probe'")
                assert(m.next() && m.getLong(1) === 1L)
              }
            } finally conn.close()
          } catch { case t: Throwable => errors.add(t) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "concurrent clients timed out")
    assert(errors.isEmpty, s"concurrent client failed: ${Option(errors.peek()).map(_.toString)}")
    import scala.jdk.CollectionConverters._
    assert(results.size === 10 && results.asScala.toSet.size === 1,
      "both sessions must compute the identical kernel result every time")
  }

  /** r12 (verdict #5): the composed pipeline operators are SQL TABLE
    * functions, so a plain JDBC client — no graft classes, no Scala —
    * composes the flagship quality -> dedup -> sample corpus-prep
    * pipeline in pure SQL, chaining TVF stages through temp views.
    * The assertion is the strongest available: the wire result equals
    * the Scala-composed `pipeline_corpus` registry query row for row
    * (same operators, same plan — the TVF builders delegate to the
    * identical Scala functions).
    */
  test("a JDBC client composes quality -> dedup -> sample in pure SQL") {
    val conn = DriverManager.getConnection(url, "graft", "")
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE OR REPLACE TEMPORARY VIEW sqlp_q AS " +
        "SELECT d.* FROM documents d " +
        "JOIN graft_quality('documents') s USING (doc_id) WHERE s.is_quality")
      st.execute(
        "CREATE OR REPLACE TEMPORARY VIEW sqlp_canon AS " +
        "SELECT d.* FROM documents d JOIN (SELECT canonical_id AS doc_id " +
        "FROM graft_exact_dedup('sqlp_q')) c USING (doc_id)")
      val rs = st.executeQuery(
        "SELECT doc_id, lang, source " +
        "FROM graft_hash_sample('sqlp_canon', 'doc_id', 0, 50) ORDER BY doc_id")
      val wire = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => (r.getLong(1), r.getString(2), r.getString(3)))
        .toVector
      val scalaSide = Queries.asMap("pipeline_corpus").build(spark, sf())
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).toVector
      assert(wire.nonEmpty, "the SQL pipeline must select a non-empty corpus")
      assert(wire === scalaSide,
        "the pure-SQL TVF pipeline must equal the Scala-composed pipeline_corpus")
      // arity misuse fails with the TVF's own signature message, not a
      // bare analysis stack — what a SQL-only user actually sees
      val err = intercept[java.sql.SQLException] {
        st.executeQuery("SELECT * FROM graft_hash_sample('documents')")
      }
      assert(err.getMessage.contains("graft_hash_sample expects 4 arguments"))
      st.execute("DROP VIEW IF EXISTS sqlp_q")
      st.execute("DROP VIEW IF EXISTS sqlp_canon")
    } finally conn.close()
  }

  /** r13 (verdict #6): the r12 statistics operators are reachable in
    * pure SQL too — a JDBC client scales its columns in a temp view
    * (the TVF column arguments are names, the scaling contract is the
    * view's job) and calls each kernel by SQL name. Assertion: the
    * wire result equals the SAME Stats method invoked in-process on
    * the SAME view, row for row and bit for bit (the TVF builders
    * delegate to the identical Scala functions — zero forked logic).
    */
  test("a JDBC client runs the stats family (kendall/spearman/anova/ttest/auc/chisq/kappa/bootstrap) over the wire") {
    import org.apache.spark.sql.functions.col
    val conn = DriverManager.getConnection(url, "graft", "")
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE OR REPLACE TEMPORARY VIEW stats_v AS SELECT " +
        "round(l_quantity) AS qty, round(l_discount * 100) AS disc_c, " +
        "round(l_tax * 100) AS tax_c, round(l_extendedprice) AS price_c, " +
        "CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS arm, " +
        "l_orderkey % 2 = 0 AS arm_b, " +
        "l_returnflag = 'R' AS label, " +
        "l_orderkey, l_linenumber, l_returnflag, l_linestatus, " +
        "(l_partkey % 7)::STRING AS pk7, l_partkey % 7 AS pk7_n " +
        "FROM lineitem")
      val wireCalls: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
        "graft_kendall('stats_v', 'qty', 'disc_c')" ->
          (() => operators.Stats.kendallTau(spark.table("stats_v"),
            col("qty"), col("disc_c"))),
        "graft_spearman('stats_v', 'qty', 'disc_c', 'tax_c')" ->
          (() => operators.Stats.spearmanMatrix(spark.table("stats_v"),
            Seq("qty" -> col("qty"), "disc_c" -> col("disc_c"),
              "tax_c" -> col("tax_c")))),
        "graft_anova('stats_v', 'l_returnflag', 'price_c')" ->
          (() => operators.Stats.oneWayAnova(spark.table("stats_v"),
            col("l_returnflag"), col("price_c"))),
        "graft_welch_ttest('stats_v', 'arm', 'price_c')" ->
          (() => operators.Stats.welchTTest(spark.table("stats_v"),
            col("arm"), col("price_c"))),
        "graft_auc('stats_v', 'price_c', 'label')" ->
          (() => operators.Stats.rocAuc(spark.table("stats_v"),
            col("price_c"), col("label"))),
        "graft_chisq('stats_v', 'l_returnflag', 'l_linestatus')" ->
          (() => operators.Stats.chiSquareCells(spark.table("stats_v"),
            col("l_returnflag"), col("l_linestatus"))),
        "graft_cramers_v('stats_v', 'l_returnflag', 'pk7')" ->
          (() => operators.Stats.cramersV(spark.table("stats_v"),
            col("l_returnflag"), col("pk7"))),
        "graft_cohens_kappa('stats_v', 'l_returnflag', 'l_linestatus')" ->
          (() => operators.Stats.cohensKappa(spark.table("stats_v"),
            col("l_returnflag"), col("l_linestatus"))),
        "graft_bootstrap('stats_v', 'l_orderkey', 'price_c', 8)" ->
          (() => operators.Stats.poissonBootstrap(spark.table("stats_v"),
            col("l_orderkey"), col("price_c"), replicates = 8)),
        // r13 batch-2 kernels over the same wire contract
        "graft_wilcoxon('stats_v', 'qty', 'disc_c')" ->
          (() => operators.Stats.wilcoxonSignedRank(spark.table("stats_v"),
            col("qty"), col("disc_c"))),
        "graft_cohens_d('stats_v', 'label', 'price_c')" ->
          (() => operators.Stats.cohensD(spark.table("stats_v"),
            col("label"), col("price_c"))),
        "graft_odds_ratio('stats_v', 'label', 'arm_b')" ->
          (() => operators.Stats.oddsRatio(spark.table("stats_v"),
            col("label"), col("arm_b"))),
        "graft_permutation('stats_v', 'l_orderkey', 'label', 'price_c', 19)" ->
          (() => operators.Stats.permutationTest(spark.table("stats_v"),
            col("l_orderkey"), col("label"), col("price_c"), reps = 19)),
        "graft_confusion('stats_v', 'l_returnflag', 'l_linestatus')" ->
          (() => operators.Stats.confusionStats(spark.table("stats_v"),
            col("l_returnflag"), col("l_linestatus"))),
        "graft_avg_precision('stats_v', 'l_orderkey', 'price_c', 'label')" ->
          (() => operators.Stats.averagePrecision(spark.table("stats_v"),
            col("l_orderkey"), col("price_c"), col("label"))),
        "graft_weighted_median('stats_v', 'l_returnflag', 'price_c', 'qty')" ->
          (() => operators.Stats.weightedMedian(spark.table("stats_v"),
            col("l_returnflag"), col("price_c"), col("qty"))),
        "graft_trend_test('stats_v', 'pk7_n', 'label')" ->
          (() => operators.Stats.cochranArmitage(spark.table("stats_v"),
            col("pk7_n"), col("label")))
      )
      for ((call, local) <- wireCalls) {
        val rs = st.executeQuery(s"SELECT * FROM $call")
        val ncols = rs.getMetaData.getColumnCount
        val wire = Iterator.continually(rs).takeWhile(_.next())
          .map(r => (1 to ncols).map(i => String.valueOf(r.getObject(i))).mkString("|"))
          .toVector.sorted
        val scalaSide = local().collect()
          .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))).mkString("|"))
          .toVector.sorted
        assert(wire.nonEmpty, s"$call returned no rows")
        assert(wire === scalaSide, s"$call: wire != Scala")
      }
      st.execute("DROP VIEW IF EXISTS stats_v")
    } finally conn.close()
  }

  /** r14 (verdict #5): the r13 wave-2/3 kernels — changepoint,
    * log-rank survival, HITS, MAP@k, EMD/t-closeness, mode, gap
    * profile, CDC chunking, Kruskal–Wallis, McNemar, mutual info,
    * SRM, Theil–Sen, Brier — reachable by SQL name with the identical
    * wire==Scala contract as the first two waves.
    */
  test("a JDBC client runs the r13 wave-2/3 kernels (changepoint/log_rank/hits/map_at_k/...) over the wire") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val conn = DriverManager.getConnection(url, "graft", "")
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE OR REPLACE TEMPORARY VIEW w3_li AS SELECT " +
        "round(l_quantity) AS qty, round(l_extendedprice) AS price_c, " +
        "l_returnflag = 'R' AS label, l_orderkey % 2 = 0 AS arm_b, " +
        "l_returnflag, l_linestatus, l_orderkey FROM lineitem")
      st.execute(
        "CREATE OR REPLACE TEMPORARY VIEW w3_edges AS SELECT " +
        "o_custkey AS src, l_suppkey + 10000000 AS dst " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey")
      st.execute(
        "CREATE OR REPLACE TEMPORARY VIEW w3_emb AS SELECT * FROM embeddings " +
        "WHERE vec_id IS NOT NULL AND embedding IS NOT NULL " +
        "AND all_finite(embedding)")
      st.execute(
        "CREATE OR REPLACE TEMPORARY VIEW w3_q AS SELECT * FROM w3_emb " +
        "WHERE vec_id < 8")
      val wireCalls: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
        "graft_changepoint('events', 'event_type', 'ts')" ->
          (() => operators.TimeSeries.changepointBinary(
            spark.table("events"), "event_type", "ts")),
        "graft_log_rank('events', 'user_id', 'ts', 1)" ->
          (() => operators.Analytics.logRankTest(spark.table("events"),
            "user_id", "ts", pmod(col("u"), lit(2L)), censorDays = 1)),
        "graft_hits('w3_edges', 'src', 'dst', 2)" ->
          (() => operators.GraphMetrics.hits(spark.table("w3_edges"),
            "src", "dst", iters = 2)),
        "graft_map_at_k('w3_emb', 'w3_q', 'vec_id', 'embedding', 'label', 10)" ->
          (() => operators.Similarity.mapAtK(spark.table("w3_emb"),
            spark.table("w3_q"), "vec_id", "embedding", "label", k = 10)),
        "graft_emd('w3_li', 'l_returnflag', 'price_c')" ->
          (() => operators.Stats.emd1d(spark.table("w3_li"),
            "l_returnflag", "price_c")),
        "graft_mode('w3_li', 'l_returnflag', 'qty')" ->
          (() => operators.Stats.modePerGroup(spark.table("w3_li"),
            col("l_returnflag"), col("qty"))),
        "graft_gap_stats('events', 'user_id', 'ts', 'event_id')" ->
          (() => operators.Analytics.gapStats(spark.table("events"),
            "user_id", "ts", "event_id")),
        "graft_cdc_report('documents', 'doc_id', 'text', 32)" ->
          (() => operators.Dedup.cdcChunkReport(spark.table("documents"),
            "doc_id", "text", modulus = 32)),
        "graft_kruskal('w3_li', 'l_returnflag', 'price_c')" ->
          (() => operators.Stats.kruskalWallis(spark.table("w3_li"),
            col("l_returnflag"), col("price_c"))),
        "graft_mcnemar('w3_li', 'label', 'arm_b')" ->
          (() => operators.Stats.mcnemar(spark.table("w3_li"),
            col("label"), col("arm_b"))),
        "graft_mutual_info('w3_li', 'l_returnflag', 'l_linestatus')" ->
          (() => operators.Stats.mutualInformation(spark.table("w3_li"),
            col("l_returnflag"), col("l_linestatus"))),
        "graft_srm('w3_li', 'arm_b')" ->
          (() => operators.Stats.srmCheck(spark.table("w3_li"), col("arm_b"))),
        "graft_theil_sen('events', 'event_type', 'ts')" ->
          (() => operators.TimeSeries.theilSen(spark.table("events"),
            "event_type", "ts")),
        "graft_brier('w3_li', 'price_c', 'label', 8)" ->
          (() => operators.Stats.brierDecomposition(spark.table("w3_li"),
            col("price_c"), col("label"), nBins = 8))
      )
      for ((call, local) <- wireCalls) {
        val rs = st.executeQuery(s"SELECT * FROM $call")
        val ncols = rs.getMetaData.getColumnCount
        val wire = Iterator.continually(rs).takeWhile(_.next())
          .map(r => (1 to ncols).map(i => String.valueOf(r.getObject(i))).mkString("|"))
          .toVector.sorted
        val scalaSide = local().collect()
          .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))).mkString("|"))
          .toVector.sorted
        assert(wire.nonEmpty, s"$call returned no rows")
        assert(wire === scalaSide, s"$call: wire != Scala")
      }
      Seq("w3_li", "w3_edges", "w3_emb", "w3_q")
        .foreach(v => st.execute(s"DROP VIEW IF EXISTS $v"))
    } finally conn.close()
  }

  test("a JDBC client runs the r14 wave-2 kernels (moran/ordinal/kappa/icc/.../reciprocity) over the wire") {
    import org.apache.spark.sql.functions.col
    val conn = DriverManager.getConnection(url, "graft", "")
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE OR REPLACE TEMPORARY VIEW w4_li AS SELECT " +
        "least(9, cast(round(l_quantity) as bigint) div 5) AS xb, " +
        "least(9, cast(round(l_extendedprice) as bigint) div 10000) AS yb, " +
        "least(4, cast(round(l_quantity) as bigint) div 10) AS a4, " +
        "least(4, cast(round(l_extendedprice) as bigint) div 20000) AS b4, " +
        "l_linestatus, l_discount >= 0.05 AS expo, l_returnflag = 'R' AS ret " +
        "FROM lineitem")
      st.execute(
        "CREATE OR REPLACE TEMPORARY VIEW w4_sup AS SELECT s_nationkey, " +
        "cast(round(s_acctbal*100) as bigint) AS bal_c FROM supplier")
      st.execute(
        "CREATE OR REPLACE TEMPORARY VIEW w4_docs AS SELECT n_chars, " +
        "lang = 'en' AS is_en FROM documents")
      st.execute(
        "CREATE OR REPLACE TEMPORARY VIEW w4_ev AS SELECT event_type, ts, " +
        "user_id, event_id, cast(round(value*100) as bigint) AS v_c FROM events")
      st.execute(
        "CREATE OR REPLACE TEMPORARY VIEW w4_edges AS SELECT src, dst FROM " +
        "(SELECT l_partkey AS src, lead(l_partkey) OVER " +
        "(PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst " +
        "FROM lineitem) WHERE dst IS NOT NULL")
      val wireCalls: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
        "graft_moran('w4_sup', 's_nationkey', 'bal_c')" ->
          (() => operators.Stats.spatialAutocorr(spark.table("w4_sup"),
            col("s_nationkey"), col("bal_c"))),
        "graft_ordinal_assoc('w4_li', 'xb', 'yb')" ->
          (() => operators.Stats.ordinalAssociation(spark.table("w4_li"),
            col("xb"), col("yb"))),
        "graft_weighted_kappa('w4_li', 'a4', 'b4')" ->
          (() => operators.Stats.weightedKappa(spark.table("w4_li"),
            col("a4"), col("b4"))),
        "graft_icc('w4_ev', 'user_id', 'v_c')" ->
          (() => operators.Stats.iccOneWay(spark.table("w4_ev"),
            col("user_id"), col("v_c"))),
        "graft_mantel_haenszel('w4_li', 'l_linestatus', 'expo', 'ret')" ->
          (() => operators.Stats.mantelHaenszel(spark.table("w4_li"),
            col("l_linestatus"), col("expo"), col("ret"))),
        "graft_log_loss('w4_docs', 'n_chars', 'is_en')" ->
          (() => operators.Stats.linearLogLoss(spark.table("w4_docs"),
            col("n_chars"), col("is_en"))),
        "graft_hosmer_lemeshow('w4_docs', 'n_chars', 'is_en', 10)" ->
          (() => operators.Stats.hosmerLemeshow(spark.table("w4_docs"),
            col("n_chars"), col("is_en"), nBins = 10)),
        "graft_bartels('events', 'event_type', 'ts')" ->
          (() => operators.TimeSeries.bartelsRankTest(spark.table("events"),
            "event_type", "ts")),
        "graft_theil_u('events', 'event_type', 'ts')" ->
          (() => operators.TimeSeries.theilU(spark.table("events"),
            "event_type", "ts")),
        "graft_drawdown('w4_ev', 'event_type', 'ts', 'v_c')" ->
          (() => operators.TimeSeries.maxDrawdown(spark.table("w4_ev"),
            "event_type", "ts", col("v_c"))),
        "graft_interval_union('events', 'user_id', 'ts', 'event_id')" ->
          (() => operators.Analytics.intervalUnion(spark.table("events"),
            "user_id", "ts", "event_id")),
        "graft_reciprocity('w4_edges', 'src', 'dst')" ->
          (() => operators.GraphMetrics.reciprocity(spark.table("w4_edges"),
            "src", "dst"))
      )
      for ((call, local) <- wireCalls) {
        val rs = st.executeQuery(s"SELECT * FROM $call")
        val ncols = rs.getMetaData.getColumnCount
        val wire = Iterator.continually(rs).takeWhile(_.next())
          .map(r => (1 to ncols).map(i => String.valueOf(r.getObject(i))).mkString("|"))
          .toVector.sorted
        val scalaSide = local().collect()
          .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))).mkString("|"))
          .toVector.sorted
        assert(wire.nonEmpty, s"$call returned no rows")
        assert(wire === scalaSide, s"$call: wire != Scala")
      }
      Seq("w4_li", "w4_sup", "w4_docs", "w4_ev", "w4_edges")
        .foreach(v => st.execute(s"DROP VIEW IF EXISTS $v"))
    } finally conn.close()
  }

  /** The r11 concurrency soak (verdict #6): the 2-client test above
    * proves the wiring; this one holds N=16 mixed kernel+metrics
    * clients against the endpoint for a sustained window
    * (`SPARK_GRAFT_SOAK_SEC`, default 45 s in CI — run manually at
    * 180 s+ for the recorded soak) and asserts the properties that
    * only show up under sustained load:
    *
    *  - zero client errors across the whole window;
    *  - no cross-client interference: every client's own temp view
    *    keeps its value (the server runs singleSession=true by
    *    design — kernels and metrics views are shared — so the
    *    interference probe is per-client NAMED state, not session
    *    cloning), and the kernel query returns the identical value
    *    on every iteration of every client;
    *  - flat latency: the median per-iteration latency of the last
    *    third of the window must not exceed 3× the first third's
    *    (a leak — metrics accumulation, session state, thrift
    *    operation handles — shows up as monotonic latency growth).
    */
  test("16-client mixed-workload soak: zero errors, no interference, flat latency") {
    import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}
    val nClients = 16
    val soakSec = sys.env.getOrElse("SPARK_GRAFT_SOAK_SEC", "45").toInt
    // SPARK_GRAFT_SOAK_SEC=0 (or negative) opts a constrained CI box
    // out of the ~1 min of wall time + 16 concurrent JDBC clients
    // (r12, ADVICE) — the 2-client test above still covers the wiring.
    assume(soakSec > 0, "soak disabled via SPARK_GRAFT_SOAK_SEC=0")
    MetricsRegistry.clear()
    MetricsService.record(spark, "soak_probe") {
      spark.sql("SELECT count(*) FROM lineitem").collect()
    }
    val kernelSql =
      "SELECT sum(element_at(minhash_sig(split(text, '\\\\s+'), 4), 1)) AS s " +
      "FROM documents WHERE doc_id < 50"
    val errors = new ConcurrentLinkedQueue[Throwable]()
    val kernelValues = new ConcurrentLinkedQueue[java.lang.Long]()
    // (wall-clock ms at iteration start, iteration latency ms)
    val latencies = new ConcurrentLinkedQueue[(Long, Double)]()
    val iterations = new java.util.concurrent.atomic.AtomicLongArray(nClients)
    val t0 = System.nanoTime()
    val deadline = t0 + soakSec * 1000000000L
    val pool = Executors.newFixedThreadPool(nClients)
    (0 until nClients).foreach { i =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            val conn = DriverManager.getConnection(url, s"graft_$i", "")
            try {
              val st = conn.createStatement()
              // per-client named state: clobbering by any other client
              // (or by the server recycling sessions) flips the probe
              st.execute(s"CREATE OR REPLACE TEMPORARY VIEW soak_probe_$i AS SELECT $i AS me")
              while (System.nanoTime() < deadline) {
                val it0 = System.nanoTime()
                val r = st.executeQuery(kernelSql)
                assert(r.next()); kernelValues.add(r.getLong(1))
                val v = st.executeQuery(s"SELECT me FROM soak_probe_$i")
                assert(v.next() && v.getInt(1) === i,
                  s"client $i's view returned someone else's row")
                val m = st.executeQuery(
                  "SELECT n_queries FROM graft_metrics_summary WHERE name = 'soak_probe'")
                assert(m.next() && m.getLong(1) === 1L)
                latencies.add(((it0 - t0) / 1000000L, (System.nanoTime() - it0) / 1e6))
                iterations.incrementAndGet(i)
              }
            } finally conn.close()
          } catch { case t: Throwable => errors.add(t) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(soakSec + 180, TimeUnit.SECONDS), "soak clients hung")
    // singleSession=true means the per-client probe views landed in the
    // SHARED session catalog; drop them so the soak leaves no residue
    // in later tests (r12, ADVICE)
    (0 until nClients).foreach(i => spark.catalog.dropTempView(s"soak_probe_$i"))
    assert(errors.isEmpty, s"soak client failed: ${Option(errors.peek()).map(_.toString)}")
    import scala.jdk.CollectionConverters._
    (0 until nClients).foreach(i =>
      assert(iterations.get(i) >= 3, s"client $i starved (${iterations.get(i)} iterations)"))
    assert(kernelValues.asScala.toSet.size === 1,
      "kernel result drifted across clients/iterations")
    val lats = latencies.asScala.toVector.sortBy(_._1)
    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    val third = lats.size / 3
    val first = median(lats.take(third).map(_._2))
    val last = median(lats.takeRight(third).map(_._2))
    info(f"soak: ${lats.size} iterations over $soakSec s, " +
      f"p50 first-third $first%.0f ms, last-third $last%.0f ms")
    assert(last <= math.max(first * 3, 1000.0),
      f"latency grew across the soak window: $first%.0f ms -> $last%.0f ms")
  }

  test("STREAMING batch latencies are retrievable via SQL too (the other half of GetMetrics)") {
    import graft.streaming.StreamingMetrics
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val tracker = StreamingMetrics.attach(spark, queryName = Some("endpoint_probe"))
    MetricsRegistry.publish("endpoint_probe", tracker)
    val q = input.toDF().toDF("v").groupBy().count()
      .writeStream.format("memory").queryName("endpoint_probe")
      .outputMode("complete").start()
    try {
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      input.addData(4L)
      q.processAllAvailable()
      val conn = DriverManager.getConnection(url, "graft", "")
      try {
        val rs = conn.createStatement().executeQuery(
          "SELECT name, n_queries, p50_ms, records FROM graft_metrics_summary " +
          "WHERE kind = 'stream_batch' AND name = 'endpoint_probe'")
        assert(rs.next(), "published tracker's micro-batches missing from the SQL surface")
        assert(rs.getLong("n_queries") >= 2L, "both micro-batches should be visible")
        assert(rs.getDouble("p50_ms") >= 0.0)
        assert(rs.getLong("records") >= 4L, "input rows ride along per batch")
      } finally conn.close()
    } finally {
      q.stop()
      MetricsRegistry.unpublish(tracker)
      StreamingMetrics.detach(spark, tracker)
    }
  }
}
