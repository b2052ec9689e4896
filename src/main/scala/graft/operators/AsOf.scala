package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot-as-of semantics (reference: internal/libqpu — the
  * SnapshotTimePredicate bounds on every query select which version of
  * the state a snapshot reads; the reference tracks versions with
  * vector clocks per record).
  *
  * Batch re-expression: the "state" is an event log; the snapshot as of
  * time T is the latest record per key with event time <= T. One
  * shuffle on the key; the time filter pushes to the scan so later
  * snapshots don't rescan the future.
  */
object AsOf {

  /** Latest row per `key` with `timeCol <= asOf`. `tiebreak` makes the
    * winner deterministic when event times collide.
    */
  def snapshotAsOf(df: DataFrame, timeCol: String, asOf: Column,
                   key: Seq[String], tiebreak: Seq[String]): DataFrame =
    latestPerKey(df.filter(col(timeCol) <= asOf), timeCol, key, tiebreak)

  /** The winning (newest) row per key — the single definition of
    * "latest" shared by snapshots, diffs, and the streaming upsert
    * sink, so tie-breaking can never silently diverge between them.
    */
  def latestPerKey(df0: DataFrame, timeCol: String,
                   key: Seq[String], tiebreak: Seq[String]): DataFrame = {
    // a record missing its event time, tiebreak, or key has no place
    // in the version order — excluded (fuzz r12; engines NULL-sort
    // differently, and a NULL-key "latest" is meaningless)
    val df = df0.filter(
      (timeCol +: (key ++ tiebreak)).map(col(_).isNotNull).reduce(_ && _))
    val order = (col(timeCol).desc +: tiebreak.map(col(_).desc))
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** As-of join (temporal join): each left row picks the LATEST right
    * row of the same key with `rightTs <= leftTs` (left-outer: a left
    * row with no prior right row keeps nulls). The classic attribution
    * / point-in-time-lookup operator; Spark has no native form.
    *
    * Scale shape: NOT an inequality join (which Catalyst would plan as
    * a per-key cartesian). Both sides are unioned and windowed — one
    * shuffle on the key, one sort within partitions, then each left
    * row reads the running `last(right, ignoreNulls)` — identical cost
    * to a sort-merge join regardless of how many right rows precede
    * each left row. Ties on (key, ts): right rows sort before left
    * rows (<= is inclusive) and `rightTiebreak` makes the winning
    * right row deterministic.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               rightCols: Seq[String],
               rightTiebreak: Seq[String] = Nil): DataFrame = {
    // internal plumbing columns use a namespaced prefix (and struct
    // fields are extracted with getField, never "a.b" string paths) so
    // user columns named "__k" — or containing dots — bind correctly
    val P = "__graft_asof_"
    require(!(left.columns ++ right.columns).exists(_.startsWith(P)),
      s"column names starting with '$P' are reserved by asofJoin")
    val (kc, tc, sc, rv, lrow, m) =
      (s"${P}k", s"${P}t", s"${P}side", s"${P}rv", s"${P}lrow", s"${P}match")
    // name-based references are backquoted so a dot in a user column
    // name is a literal character, not a struct path
    def q(c: String): Column = col(s"`${c.replace("`", "``")}`")
    val rvCols = (rightCols ++ rightTiebreak).distinct
    val rvType = right.select(rvCols.map(q): _*).schema
    val lrowType = left.schema
    // NULL key/ts rows excluded on BOTH sides (fuzz r12): the as-of
    // predicate ts<=t is undefined for NULL time, and a NULL key row
    // would window-group with other NULL keys where a join never
    // matches them — engine-dependent either way
    val left1 = left.filter(q(leftKey).isNotNull && q(leftTs).isNotNull)
    val right1 = right.filter(
      (Seq(rightKey, rightTs) ++ rightTiebreak).map(q(_).isNotNull).reduce(_ && _))
    val l2 = left1.select(q(leftKey).as(kc), q(leftTs).as(tc),
      lit(1).as(sc), lit(null).cast(rvType).as(rv),
      struct(left.columns.toIndexedSeq.map(q): _*).as(lrow))
    val r2 = right1.select(q(rightKey).as(kc), q(rightTs).as(tc),
      lit(0).as(sc), struct(rvCols.map(q): _*).as(rv),
      lit(null).cast(lrowType).as(lrow))
    val order = col(tc).asc +: col(sc).asc +:
      rightTiebreak.map(c => col(rv).getField(c).asc)
    val w = Window.partitionBy(kc).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // left1/l2 reference left.columns for the output projection;
    // the filter above only drops rows, never columns
    l2.unionByName(r2)
      .withColumn(m, last(col(rv), ignoreNulls = true).over(w))
      .filter(col(sc) === 1)
      .select(left.columns.toIndexedSeq.map(c => col(lrow).getField(c).as(c)) ++
        rightCols.map(c => col(m).getField(c).as(c)): _*)
  }

  /** Version-diff read (reference: inMemIndex.go:523-645 — postings
    * carry vector-clock versions, so an index can be read at two
    * different timestamps): which keys were created / updated /
    * deleted between the snapshot at `t1` and the snapshot at `t2`.
    *
    * A key's version identity is the (event time, tiebreak) of its
    * winning record — two snapshots disagree exactly when a newer
    * record arrived in between. Both snapshots are one pruned scan +
    * one keyed window each; the diff is a co-partitioned full outer
    * join on the key, so nothing here exceeds the cost of two as-of
    * reads. Keys unchanged between the snapshots are dropped (the
    * output is the delta, O(changes), not O(keys)).
    */
  def snapshotDiff(df: DataFrame, timeCol: String, t1: Column, t2: Column,
                   key: Seq[String], tiebreak: Seq[String]): DataFrame = {
    val ver = struct((timeCol +: tiebreak).map(col): _*)
    val s1 = snapshotAsOf(df, timeCol, t1, key, tiebreak)
      .select(key.map(col) :+ ver.as("__v1"): _*)
    val s2 = snapshotAsOf(df, timeCol, t2, key, tiebreak)
      .select(key.map(col) :+ ver.as("__v2"): _*)
    s1.join(s2, key, "full_outer")
      .withColumn("change",
        when(col("__v1").isNull, lit("created"))
          .when(col("__v2").isNull, lit("deleted"))
          .when(!(col("__v1") <=> col("__v2")), lit("updated")))
      .filter(col("change").isNotNull) // unchanged keys fall out of the delta
      .select(key.map(col) :+ col("change"): _*)
  }
}
