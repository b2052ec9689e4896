package graft

/** Targeted log hygiene for the driver entry points (Bench/Verify).
  *
  * WindowExec logs "No Partition Defined for Window operation!" for
  * every partition-less window it executes. In this library every
  * global window runs over a frame bounded by construction (≤topN,
  * ≤buckets, or group cardinality — see PlanAuditSpec's
  * bounded-global-window allowlist assert, which fails the build if a
  * query outside the allowlist plans one), so the warning is pure
  * noise here — and at hundreds of repetitions per bench run it
  * drowns the 2 kB stdout/stderr tail the driver captures. Downgrade
  * that ONE logger to ERROR; everything else keeps the session's WARN
  * level so real warnings still surface.
  */
object GraftLogging {
  def quietBoundedWindowWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  /** Bench's between-query storage drain unpersists every persistent
    * RDD — including locally-checkpointed ones, which log a WARN
    * ("lineage has been truncated and cannot be recomputed") per RDD.
    * That is the drain working as designed (nothing re-executes a
    * finished query's checkpoint), and at 220 queries the repetitions
    * would drown the stderr tail. RDD unpersist logs under the
    * concrete RDD class; the checkpoint path is always a
    * MapPartitionsRDD.
    */
  def quietCheckpointUnpersistWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
}
