package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension merge: apply a change batch to a
  * versioned dimension table, closing out superseded rows and inserting new
  * current rows, with full history retained.
  *
  * The reference's store keeps only the LATEST state of every item — an
  * `update_item` on a DynamoDB row destroys its past (`code/manager.py:465-`).
  * A training-data pipeline auditing 100 TB needs the other contract too:
  * "what did this dimension row look like when that batch was processed?"
  * SCD2 is the canonical answer — each key carries a timeline of rows
  * `[valid_from, valid_to)` with exactly one open (`is_current`) row.
  *
  * Scale shape: history rows (`is_current = false`) pass through WITHOUT
  * touching the join — only the current slice (≤ one row per key) joins the
  * change batch, and a change batch is typically small → Catalyst broadcasts
  * it (AQE promotes when the stats say so). One shuffle at most, on the
  * current slice only; at 100 TB the immutable history is never rewritten,
  * which is also exactly the partition layout you'd want on disk (partition
  * by `is_current`, so the merge rewrites only the current partition).
  */
object Scd2 {

  /** Epoch-micros timestamp used by the gate's change batch. */
  val GateEffUs = 1000000L

  /** Merge `changes` (one row per key: `key`, `attrs`, `effCol` epoch-micros)
    * into SCD2 `dim` (`key`, `attrs`, `valid_from`, `valid_to`, `is_current`).
    *
    *  - key present & any attr differs → close the current row
    *    (`valid_to = eff`, `is_current = false`) and insert the new version
    *    (`valid_from = eff`, open-ended);
    *  - key present & attrs identical → no-op (idempotent re-delivery);
    *  - key absent → plain insert;
    *  - history rows are untouched (never joined, never shuffled).
    *
    * Attribute equality is null-safe (`<=>`). Callers must pre-collapse
    * `changes` to one row per key (e.g. latest-by-eff); the require below
    * is cheap only on the batch side.
    */
  def merge(dim: DataFrame, changes: DataFrame, key: String,
      attrs: Seq[String], effCol: String = "eff_us"): DataFrame = {
    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))

    val chg = changes.select(
      (col(key).as(s"_c_$key") +: (attrs :+ effCol).map(a => col(a).as(s"_c_$a"))): _*)

    val joined = current.join(chg, col(key) === col(s"_c_$key"), "full_outer")
    val changed = attrs.map(a => !(col(a) <=> col(s"_c_$a"))).reduce(_ || _)
    val hasOld = col(key).isNotNull
    val hasChg = col(s"_c_$key").isNotNull

    // surviving old rows: unmatched keys + no-op changes stay open; a real
    // change closes the row at the change's effective time
    val oldRows = joined.filter(hasOld).select(
      (Seq(col(key)) ++ attrs.map(col) ++ Seq(
        col("valid_from"),
        when(hasChg && changed, col(s"_c_$effCol")).otherwise(col("valid_to")).as("valid_to"),
        (!(hasChg && changed) && col("is_current")).as("is_current"))): _*)

    // inserted rows: brand-new keys, plus the new version of changed keys
    val newRows = joined.filter(hasChg && (!hasOld || changed)).select(
      (Seq(col(s"_c_$key").as(key)) ++ attrs.map(a => col(s"_c_$a").as(a)) ++ Seq(
        col(s"_c_$effCol").as("valid_from"),
        lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current"))): _*)

    history.select(oldRows.columns.map(col): _*)
      .unionByName(oldRows).unionByName(newRows)
  }

  /** Promote a latest-state table to an SCD2 seed: every row current from
    * `fromUs`, open-ended.
    */
  def seed(latest: DataFrame, fromUs: Long = 0L): DataFrame =
    latest
      .withColumn("valid_from", lit(fromUs))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))

  /** Point-in-time (temporal) join: each fact row picks up the dimension
    * VERSION that was valid at its own timestamp — the lookup every
    * training-data audit needs ("which quality threshold / mixture weight
    * was live when this shard was built?"). Produces all fact columns plus
    * the dim attributes (bookkeeping columns dropped); facts with no valid
    * version at their time keep nulls (left join).
    *
    * Plan shape: an equi-join on the key with the interval condition as a
    * residual filter — the key join bounds candidates to each fact's own
    * timeline (a handful of versions), so there is no range-explosion; a
    * small dimension broadcasts as usual.
    */
  def pointInTime(facts: DataFrame, factKey: String, tsCol: String,
      dim: DataFrame, dimKey: String): DataFrame = {
    val attrs = dim.columns.filterNot(
      Set(dimKey, "valid_from", "valid_to", "is_current"))
    val cond = facts(factKey) === dim(dimKey) &&
      dim("valid_from") <= facts(tsCol) &&
      (dim("valid_to").isNull || facts(tsCol) < dim("valid_to"))
    facts.join(dim, cond, "left")
      .select(facts.columns.map(facts(_)) ++ attrs.map(dim(_)): _*)
  }
}
