package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Malformed-record quarantine (dead-letter routing) — the ingestion
  * hygiene step every production pipeline puts in front of the
  * operators: rows whose embedded JSON fails to parse against the
  * declared schema, or whose parsed values violate declared
  * invariants, are ROUTED to a quarantine frame with a stable reason
  * code instead of silently becoming NULLs that poison downstream
  * aggregates (the reference's datastore drivers skip malformed
  * notifications one by one — the row-decode error path in
  * mysql/store.go; here the skipped rows are a first-class,
  * auditable, replayable output).
  *
  * Scale shape: one stateless projection — `from_json` surfaces parse
  * failure as a NULL/all-null struct, validators are plain Column
  * predicates over the parsed fields — then two complementary filters
  * over the same scan. Zero shuffle, zero UDF; both outputs stay
  * corpus-partitioned exactly like the input.
  *
  * Validator semantics: a rule fires when its predicate is FALSE or
  * NULL (a validator that cannot evaluate is a failed contract, not a
  * pass); the first failing rule in declaration order names the
  * reason; `parse_error` outranks all validators.
  */
object Quarantine {

  /** Split `df` on the JSON column: `(valid, quarantined)`. Valid rows
    * carry the parsed fields appended as top-level columns (original
    * JSON column dropped); quarantined rows keep EVERY original
    * column (the dead letter must be replayable after a fix) plus
    * `reason`. Validators reference parsed fields by their plain
    * schema names.
    */
  def route(df: DataFrame, jsonCol: String, schema: StructType,
            validators: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val fieldNames = schema.fields.map(_.name).toSeq
    require(fieldNames.intersect(df.columns.toSeq).isEmpty,
      s"schema fields ${fieldNames.intersect(df.columns.toSeq)} collide with input columns")
    val parsed = df.withColumn("__parsed", from_json(col(jsonCol), schema))
    // from_json yields NULL (or an all-null struct for object-shaped
    // garbage) when the payload does not match; a NULL input is also
    // unparseable by contract
    val parseOk = col(jsonCol).isNotNull && col("__parsed").isNotNull &&
      fieldNames.map(n => col(s"__parsed.$n").isNotNull)
        .reduceOption(_ || _).getOrElse(lit(true))
    val withFields = parsed.select(
      df.columns.map(col) ++
        fieldNames.map(n => col(s"__parsed.$n").as(n)) :+
        parseOk.as("__parse_ok"): _*)
    // first failing validator in declaration order names the reason;
    // foldRight nests so the FIRST validator is the outermost branch
    val validatorReason = validators.foldRight(lit(null: String)) {
      case ((name, pred), acc) =>
        when(coalesce(pred, lit(false)), acc).otherwise(lit(name))
    }
    val tagged = withFields.withColumn("__reason",
      when(!col("__parse_ok"), lit("parse_error")).otherwise(validatorReason))
    val valid = tagged.filter(col("__reason").isNull)
      .select((df.columns.filter(_ != jsonCol).toSeq ++ fieldNames).map(col): _*)
    val quarantined = tagged.filter(col("__reason").isNotNull)
      .select(df.columns.map(col) :+ col("__reason").as("reason"): _*)
    (valid, quarantined)
  }

  /** Audit summary: one row per routing outcome — ('ok', n) plus a
    * (reason, n) row per quarantine reason — the number an ingestion
    * dashboard plots per batch.
    */
  def auditCounts(df: DataFrame, jsonCol: String, schema: StructType,
                  validators: Seq[(String, Column)]): DataFrame = {
    val (valid, quarantined) = route(df, jsonCol, schema, validators)
    valid.select(lit("ok").as("status")).groupBy("status")
      .agg(count(lit(1)).as("n"))
      .unionByName(quarantined.select(col("reason").as("status"))
        .groupBy("status").agg(count(lit(1)).as("n")))
  }
}
