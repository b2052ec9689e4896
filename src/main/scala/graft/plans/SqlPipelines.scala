package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.{col, lit, pmod}
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.functions.TextFunctions
import graft.operators.{Analytics, Dedup, GraphMetrics, Pack, Sampling, Similarity, Stats, TimeSeries}

/** SQL table functions over the COMPOSED pipeline operators (r12,
  * verdict #5). The scalar kernels have had SQL names since r9
  * ([[GraftExtensions.builders]]), but the multi-stage operators
  * (near-dup clustering, canonical selection, deterministic sampling,
  * chunking) were Scala-only — a pure-SQL client (Thrift JDBC, Spark
  * Connect, the CLI) could not run the very pipelines the library is
  * for. The reference ships client libraries that reach EVERY operator
  * (pkg/proteus-go-client/proteus_client.go); this is the Spark-native
  * equivalent: each operator becomes a Catalyst TABLE function
  * (`SparkSessionExtensions.injectTableFunction`) whose builder calls
  * the exact same Scala operator and returns its logical plan, so
  *
  *   SELECT * FROM graft_dedup_clusters('documents', 2, 4, 3)
  *
  * is the same Catalyst plan as `Dedup.minhashClusters(...)` — same
  * shuffles, same broadcasts, same pushdown into whatever sits under
  * the named view. Composition crosses statements through temp views
  * (CREATE TEMPORARY VIEW q AS SELECT ... FROM graft_quality(...)),
  * which is how a JDBC client chains quality -> dedup -> sample in
  * pure SQL (EndpointSpec proves it end to end).
  *
  * Contract: the first argument is always the NAME of a resolvable
  * table/view. Document-shaped functions expect the `documents`
  * schema (doc_id, text, n_chars) — the same contract the Scala API
  * has. All other arguments are literals (analysis-time constants,
  * like the kernel shape literals).
  */
object SqlPipelines {

  private def session: SparkSession =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .getOrElse(throw new IllegalStateException("no active SparkSession"))

  private def strLit(fn: String, e: Expression): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: expected a string literal, got $other")
  }

  private def intLit(fn: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer literal, got $other")
  }

  private def arity(fn: String, n: Int, sig: String)(
      f: Seq[Expression] => DataFrame): Seq[Expression] => LogicalPlan =
    args => {
      if (args.length != n) throw new IllegalArgumentException(
        s"$fn expects $n arguments: $fn($sig), got ${args.length}")
      f(args).queryExecution.logical
    }

  private def table(fn: String, e: Expression): DataFrame =
    session.table(strLit(fn, e))

  /** name -> TVF builder. Every builder delegates to the SAME operator
    * the Scala API exposes — zero forked logic.
    */
  private[graft] val builders: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    // text-analysis battery over a documents-shaped view
    "graft_quality" -> arity("graft_quality", 1, "'table'") { a =>
      val sig = TextFunctions.qualitySignals(col("text"), col("n_chars"))
        .map { case (n, c) => c.as(n) }
      table("graft_quality", a(0)).select((col("doc_id") +: sig): _*)
    },
    "graft_langid" -> arity("graft_langid", 1, "'table'") { a =>
      table("graft_langid", a(0))
        .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred"))
    },
    "graft_tokens" -> arity("graft_tokens", 1, "'table'") { a =>
      table("graft_tokens", a(0)).select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.bpeTokenCount(col("text")).as("n_bpe_tokens"))
    },
    "graft_fingerprint" -> arity("graft_fingerprint", 1, "'table'") { a =>
      table("graft_fingerprint", a(0)).select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fingerprint"))
    },
    // dedup family
    "graft_exact_dedup" -> arity("graft_exact_dedup", 1, "'table'") { a =>
      Dedup.exact(table("graft_exact_dedup", a(0)), "doc_id", "text")
    },
    "graft_minhash_pairs" ->
      arity("graft_minhash_pairs", 5, "'table', bands, rowsPerBand, num, den") { a =>
        Dedup.minhashDedup(table("graft_minhash_pairs", a(0)), "doc_id", "text",
          bands = intLit("graft_minhash_pairs", a(1)),
          rowsPerBand = intLit("graft_minhash_pairs", a(2)),
          num = intLit("graft_minhash_pairs", a(3)),
          den = intLit("graft_minhash_pairs", a(4)))
      },
    "graft_dedup_clusters" ->
      arity("graft_dedup_clusters", 4, "'table', bands, rowsPerBand, iterations") { a =>
        Dedup.minhashClusters(table("graft_dedup_clusters", a(0)), "doc_id", "text",
          bands = intLit("graft_dedup_clusters", a(1)),
          rowsPerBand = intLit("graft_dedup_clusters", a(2)),
          iterations = intLit("graft_dedup_clusters", a(3)))
      },
    "graft_dedup_canonical" ->
      arity("graft_dedup_canonical", 4, "'table', bands, rowsPerBand, iterations") { a =>
        Dedup.keepCanonical(table("graft_dedup_canonical", a(0)), "doc_id", "text",
          "n_chars",
          bands = intLit("graft_dedup_canonical", a(1)),
          rowsPerBand = intLit("graft_dedup_canonical", a(2)),
          iterations = intLit("graft_dedup_canonical", a(3)))
      },
    // sampling / selection (any table, key column named per call)
    "graft_hash_sample" ->
      arity("graft_hash_sample", 4, "'table', 'idCol', lo, hi") { a =>
        Sampling.hashBucketSample(table("graft_hash_sample", a(0)),
          strLit("graft_hash_sample", a(1)),
          lo = intLit("graft_hash_sample", a(2)),
          hi = intLit("graft_hash_sample", a(3)))
      },
    // RAG / long-doc prep
    "graft_chunk_windows" ->
      arity("graft_chunk_windows", 3, "'table', windowTokens, strideTokens") { a =>
        Pack.slidingWindows(table("graft_chunk_windows", a(0)), "doc_id", "text",
          windowTokens = intLit("graft_chunk_windows", a(1)),
          strideTokens = intLit("graft_chunk_windows", a(2)))
      },
    // statistics family (r13, verdict #6): the r12 stats operators were
    // registry-only; these give a JDBC client the same kernels in pure
    // SQL. Column arguments are string-literal COLUMN NAMES of the
    // named view — the operators' own input contracts (integral-moment
    // scaling etc.) are documented on each Stats method.
    "graft_kendall" ->
      arity("graft_kendall", 3, "'table', 'xCol', 'yCol'") { a =>
        Stats.kendallTau(table("graft_kendall", a(0)),
          col(strLit("graft_kendall", a(1))), col(strLit("graft_kendall", a(2))))
      },
    "graft_spearman" -> { args =>
      if (args.length < 3) throw new IllegalArgumentException(
        s"graft_spearman expects >= 3 arguments: graft_spearman('table', " +
          s"'col1', 'col2', ...), got ${args.length}")
      val names = args.tail.map(strLit("graft_spearman", _))
      Stats.spearmanMatrix(table("graft_spearman", args.head),
        names.map(n => n -> col(n))).queryExecution.logical
    },
    "graft_anova" ->
      arity("graft_anova", 3, "'table', 'groupCol', 'valueCol'") { a =>
        Stats.oneWayAnova(table("graft_anova", a(0)),
          col(strLit("graft_anova", a(1))), col(strLit("graft_anova", a(2))))
      },
    "graft_welch_ttest" ->
      arity("graft_welch_ttest", 3, "'table', 'armCol', 'yCol'") { a =>
        Stats.welchTTest(table("graft_welch_ttest", a(0)),
          col(strLit("graft_welch_ttest", a(1))),
          col(strLit("graft_welch_ttest", a(2))))
      },
    "graft_auc" ->
      arity("graft_auc", 3, "'table', 'scoreCol', 'labelCol'") { a =>
        Stats.rocAuc(table("graft_auc", a(0)),
          col(strLit("graft_auc", a(1))), col(strLit("graft_auc", a(2))))
      },
    "graft_chisq" ->
      arity("graft_chisq", 3, "'table', 'aCol', 'bCol'") { a =>
        Stats.chiSquareCells(table("graft_chisq", a(0)),
          col(strLit("graft_chisq", a(1))), col(strLit("graft_chisq", a(2))))
      },
    "graft_cramers_v" ->
      arity("graft_cramers_v", 3, "'table', 'aCol', 'bCol'") { a =>
        Stats.cramersV(table("graft_cramers_v", a(0)),
          col(strLit("graft_cramers_v", a(1))), col(strLit("graft_cramers_v", a(2))))
      },
    "graft_cohens_kappa" ->
      arity("graft_cohens_kappa", 3, "'table', 'rater1Col', 'rater2Col'") { a =>
        Stats.cohensKappa(table("graft_cohens_kappa", a(0)),
          col(strLit("graft_cohens_kappa", a(1))),
          col(strLit("graft_cohens_kappa", a(2))))
      },
    "graft_bootstrap" ->
      arity("graft_bootstrap", 4, "'table', 'idCol', 'centsCol', replicates") { a =>
        Stats.poissonBootstrap(table("graft_bootstrap", a(0)),
          col(strLit("graft_bootstrap", a(1))),
          col(strLit("graft_bootstrap", a(2))),
          replicates = intLit("graft_bootstrap", a(3)))
      },
    // ---- r13 batch-2 stats kernels over the wire --------------------
    "graft_wilcoxon" ->
      arity("graft_wilcoxon", 3, "'table', 'xCol', 'yCol'") { a =>
        Stats.wilcoxonSignedRank(table("graft_wilcoxon", a(0)),
          col(strLit("graft_wilcoxon", a(1))), col(strLit("graft_wilcoxon", a(2))))
      },
    "graft_cohens_d" ->
      arity("graft_cohens_d", 3, "'table', 'armCol', 'valueCol'") { a =>
        Stats.cohensD(table("graft_cohens_d", a(0)),
          col(strLit("graft_cohens_d", a(1))), col(strLit("graft_cohens_d", a(2))))
      },
    "graft_odds_ratio" ->
      arity("graft_odds_ratio", 3, "'table', 'expCol', 'outCol'") { a =>
        Stats.oddsRatio(table("graft_odds_ratio", a(0)),
          col(strLit("graft_odds_ratio", a(1))),
          col(strLit("graft_odds_ratio", a(2))))
      },
    "graft_permutation" ->
      arity("graft_permutation", 5, "'table', 'idCol', 'armCol', 'valueCol', reps") { a =>
        Stats.permutationTest(table("graft_permutation", a(0)),
          col(strLit("graft_permutation", a(1))),
          col(strLit("graft_permutation", a(2))),
          col(strLit("graft_permutation", a(3))),
          reps = intLit("graft_permutation", a(4)))
      },
    "graft_confusion" ->
      arity("graft_confusion", 3, "'table', 'actualCol', 'predCol'") { a =>
        Stats.confusionStats(table("graft_confusion", a(0)),
          col(strLit("graft_confusion", a(1))),
          col(strLit("graft_confusion", a(2))))
      },
    "graft_avg_precision" ->
      arity("graft_avg_precision", 4, "'table', 'idCol', 'scoreCol', 'labelCol'") { a =>
        Stats.averagePrecision(table("graft_avg_precision", a(0)),
          col(strLit("graft_avg_precision", a(1))),
          col(strLit("graft_avg_precision", a(2))),
          col(strLit("graft_avg_precision", a(3))))
      },
    "graft_weighted_median" ->
      arity("graft_weighted_median", 4, "'table', 'groupCol', 'valueCol', 'weightCol'") { a =>
        Stats.weightedMedian(table("graft_weighted_median", a(0)),
          col(strLit("graft_weighted_median", a(1))),
          col(strLit("graft_weighted_median", a(2))),
          col(strLit("graft_weighted_median", a(3))))
      },
    "graft_trend_test" ->
      arity("graft_trend_test", 3, "'table', 'scoreCol', 'outCol'") { a =>
        Stats.cochranArmitage(table("graft_trend_test", a(0)),
          col(strLit("graft_trend_test", a(1))),
          col(strLit("graft_trend_test", a(2))))
      },

    // r14 (verdict #5): the r13 wave-2/3 kernels — changepoint,
    // survival, graph eigen-ranking, retrieval eval, privacy EMD,
    // descriptive and cadence profiles, CDC chunking — reachable by
    // SQL name over the same delegation contract (zero forked logic)
    "graft_changepoint" ->
      arity("graft_changepoint", 3, "'table', 'seriesCol', 'tsCol'") { a =>
        TimeSeries.changepointBinary(table("graft_changepoint", a(0)),
          strLit("graft_changepoint", a(1)), strLit("graft_changepoint", a(2)))
      },
    "graft_log_rank" ->
      arity("graft_log_rank", 4, "'table', 'keyCol', 'tsCol', censorDays") { a =>
        // the arm is derived from the unit key's parity (the registry
        // q_log_rank convention) because the Scala armCol parameter is
        // an expression over the per-unit alias `u`, which a SQL
        // column-name argument cannot express; a custom assignment
        // goes through the Scala API
        Analytics.logRankTest(table("graft_log_rank", a(0)),
          strLit("graft_log_rank", a(1)), strLit("graft_log_rank", a(2)),
          pmod(col("u"), lit(2L)),
          censorDays = intLit("graft_log_rank", a(3)).toLong)
      },
    "graft_hits" ->
      arity("graft_hits", 4, "'table', 'srcCol', 'dstCol', iters") { a =>
        GraphMetrics.hits(table("graft_hits", a(0)),
          strLit("graft_hits", a(1)), strLit("graft_hits", a(2)),
          iters = intLit("graft_hits", a(3)))
      },
    "graft_map_at_k" ->
      arity("graft_map_at_k", 6,
          "'corpusTable', 'queriesTable', 'idCol', 'vecCol', 'labelCol', k") { a =>
        Similarity.mapAtK(table("graft_map_at_k", a(0)),
          table("graft_map_at_k", a(1)), strLit("graft_map_at_k", a(2)),
          strLit("graft_map_at_k", a(3)), strLit("graft_map_at_k", a(4)),
          k = intLit("graft_map_at_k", a(5)))
      },
    "graft_emd" ->
      arity("graft_emd", 3, "'table', 'groupCol', 'valueCol'") { a =>
        // the t-closeness primitive: per-group exact 1-D EMD vs corpus
        Stats.emd1d(table("graft_emd", a(0)),
          strLit("graft_emd", a(1)), strLit("graft_emd", a(2)))
      },
    "graft_mode" ->
      arity("graft_mode", 3, "'table', 'groupCol', 'valueCol'") { a =>
        Stats.modePerGroup(table("graft_mode", a(0)),
          col(strLit("graft_mode", a(1))), col(strLit("graft_mode", a(2))))
      },
    "graft_gap_stats" ->
      arity("graft_gap_stats", 4, "'table', 'keyCol', 'tsCol', 'idCol'") { a =>
        Analytics.gapStats(table("graft_gap_stats", a(0)),
          strLit("graft_gap_stats", a(1)), strLit("graft_gap_stats", a(2)),
          strLit("graft_gap_stats", a(3)))
      },
    "graft_cdc_report" ->
      arity("graft_cdc_report", 4, "'table', 'idCol', 'textCol', modulus") { a =>
        Dedup.cdcChunkReport(table("graft_cdc_report", a(0)),
          strLit("graft_cdc_report", a(1)), strLit("graft_cdc_report", a(2)),
          modulus = intLit("graft_cdc_report", a(3)))
      },
    "graft_kruskal" ->
      arity("graft_kruskal", 3, "'table', 'groupCol', 'valueCol'") { a =>
        Stats.kruskalWallis(table("graft_kruskal", a(0)),
          col(strLit("graft_kruskal", a(1))),
          col(strLit("graft_kruskal", a(2))))
      },
    "graft_mcnemar" ->
      arity("graft_mcnemar", 3, "'table', 'aCol', 'bCol'") { a =>
        Stats.mcnemar(table("graft_mcnemar", a(0)),
          col(strLit("graft_mcnemar", a(1))),
          col(strLit("graft_mcnemar", a(2))))
      },
    "graft_mutual_info" ->
      arity("graft_mutual_info", 3, "'table', 'aCol', 'bCol'") { a =>
        Stats.mutualInformation(table("graft_mutual_info", a(0)),
          col(strLit("graft_mutual_info", a(1))),
          col(strLit("graft_mutual_info", a(2))))
      },
    "graft_srm" ->
      arity("graft_srm", 2, "'table', 'armCol'") { a =>
        Stats.srmCheck(table("graft_srm", a(0)),
          col(strLit("graft_srm", a(1))))
      },
    "graft_theil_sen" ->
      arity("graft_theil_sen", 3, "'table', 'seriesCol', 'tsCol'") { a =>
        TimeSeries.theilSen(table("graft_theil_sen", a(0)),
          strLit("graft_theil_sen", a(1)), strLit("graft_theil_sen", a(2)))
      },
    "graft_brier" ->
      arity("graft_brier", 4, "'table', 'scoreCol', 'labelCol', nBins") { a =>
        Stats.brierDecomposition(table("graft_brier", a(0)),
          col(strLit("graft_brier", a(1))), col(strLit("graft_brier", a(2))),
          nBins = intLit("graft_brier", a(3)))
      },
    // round-14 wave 2: the new stats/eval/graph kernels on the wire
    "graft_moran" ->
      arity("graft_moran", 3, "'table', 'groupCol', 'valueCol'") { a =>
        Stats.spatialAutocorr(table("graft_moran", a(0)),
          col(strLit("graft_moran", a(1))), col(strLit("graft_moran", a(2))))
      },
    "graft_ordinal_assoc" ->
      arity("graft_ordinal_assoc", 3, "'table', 'xCol', 'yCol'") { a =>
        Stats.ordinalAssociation(table("graft_ordinal_assoc", a(0)),
          col(strLit("graft_ordinal_assoc", a(1))),
          col(strLit("graft_ordinal_assoc", a(2))))
      },
    "graft_weighted_kappa" ->
      arity("graft_weighted_kappa", 3, "'table', 'aCol', 'bCol'") { a =>
        Stats.weightedKappa(table("graft_weighted_kappa", a(0)),
          col(strLit("graft_weighted_kappa", a(1))),
          col(strLit("graft_weighted_kappa", a(2))))
      },
    "graft_icc" ->
      arity("graft_icc", 3, "'table', 'groupCol', 'valueCol'") { a =>
        Stats.iccOneWay(table("graft_icc", a(0)),
          col(strLit("graft_icc", a(1))), col(strLit("graft_icc", a(2))))
      },
    "graft_mantel_haenszel" ->
      arity("graft_mantel_haenszel", 4, "'table', 'stratumCol', 'expCol', 'outCol'") { a =>
        Stats.mantelHaenszel(table("graft_mantel_haenszel", a(0)),
          col(strLit("graft_mantel_haenszel", a(1))),
          col(strLit("graft_mantel_haenszel", a(2))),
          col(strLit("graft_mantel_haenszel", a(3))))
      },
    "graft_log_loss" ->
      arity("graft_log_loss", 3, "'table', 'scoreCol', 'labelCol'") { a =>
        Stats.linearLogLoss(table("graft_log_loss", a(0)),
          col(strLit("graft_log_loss", a(1))), col(strLit("graft_log_loss", a(2))))
      },
    "graft_hosmer_lemeshow" ->
      arity("graft_hosmer_lemeshow", 4, "'table', 'scoreCol', 'labelCol', nBins") { a =>
        Stats.hosmerLemeshow(table("graft_hosmer_lemeshow", a(0)),
          col(strLit("graft_hosmer_lemeshow", a(1))),
          col(strLit("graft_hosmer_lemeshow", a(2))),
          nBins = intLit("graft_hosmer_lemeshow", a(3)))
      },
    "graft_bartels" ->
      arity("graft_bartels", 3, "'table', 'seriesCol', 'tsCol'") { a =>
        TimeSeries.bartelsRankTest(table("graft_bartels", a(0)),
          strLit("graft_bartels", a(1)), strLit("graft_bartels", a(2)))
      },
    "graft_theil_u" ->
      arity("graft_theil_u", 3, "'table', 'seriesCol', 'tsCol'") { a =>
        TimeSeries.theilU(table("graft_theil_u", a(0)),
          strLit("graft_theil_u", a(1)), strLit("graft_theil_u", a(2)))
      },
    "graft_drawdown" ->
      arity("graft_drawdown", 4, "'table', 'seriesCol', 'tsCol', 'valueCol'") { a =>
        TimeSeries.maxDrawdown(table("graft_drawdown", a(0)),
          strLit("graft_drawdown", a(1)), strLit("graft_drawdown", a(2)),
          col(strLit("graft_drawdown", a(3))))
      },
    "graft_interval_union" ->
      arity("graft_interval_union", 4, "'table', 'keyCol', 'tsCol', 'idCol'") { a =>
        Analytics.intervalUnion(table("graft_interval_union", a(0)),
          strLit("graft_interval_union", a(1)),
          strLit("graft_interval_union", a(2)),
          strLit("graft_interval_union", a(3)))
      },
    "graft_reciprocity" ->
      arity("graft_reciprocity", 3, "'table', 'srcCol', 'dstCol'") { a =>
        GraphMetrics.reciprocity(table("graft_reciprocity", a(0)),
          strLit("graft_reciprocity", a(1)), strLit("graft_reciprocity", a(2)))
      }
  )
}
