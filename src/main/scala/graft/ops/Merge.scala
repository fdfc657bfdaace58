package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC merge semantics over snapshots and change logs — the MERGE INTO /
  * upsert surface a lakehouse pipeline applies before any of the analytics
  * operators run (Delta/Iceberg/Hudi expose the same contract; here it is
  * expressed as plain declarative Spark so Catalyst plans it like any other
  * query).
  *
  * Scale shape: both operators are ONE shuffle keyed by the merge key — the
  * window's sort is per-key (change logs per key are short), no driver-side
  * state, no join back to the base. At 100 TB the base snapshot and the
  * change batch co-partition on the key; with a bucketed base table the
  * exchange on the base side disappears entirely (see `ops.Skew`
  * bucketed-join tooling).
  */
object Merge {

  /** SCD type-1 MERGE (latest-wins upsert): apply a change batch onto a
    * base snapshot and return the next snapshot.
    *
    * `changes` must carry the base's columns plus `opCol` ('I'/'U' upsert,
    * 'D' delete) and `versionCol` (LONG, > 0, at most one change per
    * (key, version) — the usual CDC log contract). Base rows participate at
    * version 0, so any change outranks the base row for its key; the
    * highest version per key decides, and a winning 'D' removes the key
    * from the snapshot. New keys ('I' with no base row) simply win their
    * one-row group. */
  def upsert(base: DataFrame, changes: DataFrame, key: String,
             versionCol: String, opCol: String): DataFrame = {
    val cols = base.columns.toSeq
    val b = base
      .withColumn(opCol, lit("I"))
      .withColumn(versionCol, lit(0L))
    val all = b.unionByName(changes.select((cols :+ opCol :+ versionCol).map(col): _*))
    val w = Window.partitionBy(col(key)).orderBy(col(versionCol).desc)
    all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(opCol) =!= "D")
      .select(cols.map(col): _*)
  }

  /** SCD type-2 history build: turn a change log into validity intervals.
    * Each (key, ts) change becomes a row valid from its own timestamp until
    * the key's next change (`valid_to` NULL + `is_current` = 1 for the
    * latest). One window per key ordered by the (unique per key) change
    * timestamp. The output is the standard slowly-changing-dimension shape
    * a warehouse joins facts against with a ts BETWEEN range join (q58). */
  def scd2(changes: DataFrame, key: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
  }

  /** Snapshot diff: classify every key as added ('A'), deleted ('D'), or
    * changed ('C') between two snapshot versions; unchanged keys are
    * dropped. The reconciliation half of the CDC surface — [[upsert]]
    * applies a change log, this recovers one from two snapshots.
    *
    * ONE sort-merge full-outer join keyed by `key` (both sides
    * co-partition; with bucketed snapshots the exchanges vanish). Column
    * comparison is null-safe equality per compare column — no row-level
    * hashing, so the plan stays codegen'd and column-prunable: only
    * `compareCols` are read from either snapshot. */
  def snapshotDiff(base: DataFrame, next: DataFrame, key: String,
                   compareCols: Seq[String]): DataFrame = {
    val b = base.select((key +: compareCols).map(c => col(c).as("_b_" + c)): _*)
    val n = next.select((key +: compareCols).map(c => col(c).as("_n_" + c)): _*)
    val changed = compareCols
      .map(c => !(col("_b_" + c) <=> col("_n_" + c)))
      .reduce(_ || _)
    b.join(n, col("_b_" + key) === col("_n_" + key), "full_outer")
      .withColumn("change_type",
        when(col("_b_" + key).isNull, lit("A"))
          .when(col("_n_" + key).isNull, lit("D"))
          .when(changed, lit("C")))
      .filter(col("change_type").isNotNull)
      .select(coalesce(col("_b_" + key), col("_n_" + key)).as(key),
        col("change_type"))
  }
}
