package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression <-> Column bridge. The converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`; this shim sits inside the `org.apache.spark.sql`
  * package scope to re-export just the two conversions a library
  * defining custom Catalyst expressions needs.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp function on an existing session (the
    * SparkSessionExtensions path only covers sessions built after the
    * extension class is configured).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")

  /** Register a temp TABLE function (a `Seq[Expression] => LogicalPlan`
    * builder, usable in FROM clauses) on an existing session — the
    * live-session counterpart of `injectTableFunction`.
    */
  def registerTableFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(name, builder, "built-in")

  /** Parse a SQL statement to its unresolved logical plan (no analysis,
    * no file listing — safe to cache across data changes).
    */
  def parsePlan(spark: org.apache.spark.sql.SparkSession,
                statement: String): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    spark.sessionState.sqlParser.parsePlan(statement)

  /** Analyze + wrap a logical plan against the CURRENT session state. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
