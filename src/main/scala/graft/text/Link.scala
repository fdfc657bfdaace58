package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.JaroWinkler

/** Record linkage (entity resolution): blocked Jaro–Winkler candidate
  * pairs and connected-component entity canonicalization — the "same
  * real-world entity, different record" counterpart to [[Dedup]]'s
  * same-content operators (reference analogue: the fuzzy keyword
  * containment join of `integrate/main.py:16-29`, generalized from
  * substring containment to edit-similarity on short name fields).
  *
  * Scale shape: candidate generation is a self-equi-join on the blocking
  * key, so the pair count is Σ_B |B|² over blocks — NEVER the n² cross
  * join. The whole cost model is the block-size distribution, which is
  * why [[blockHealth]] is a first-class output (mirroring the LSH bucket
  * health reports in [[Dedup]]): blocks above `maxBlock` are EXCLUDED
  * from pairing — deterministically, so the decision is oracle-replayable
  * — and surfaced there instead of silently exploding the shuffle. At
  * 100 TB the blocking key must carry enough entropy to keep |B| bounded
  * (prefix+attribute compounds, as q267 does with noun+size); for long
  * free-text fields use MinHash LSH ([[Dedup.minhashCandidates]]) instead —
  * Jaro–Winkler is the short-name-field instrument.
  */
object Link {

  /** Blocked Jaro–Winkler pairs: records sharing `blockCols` are paired
    * (id_a < id_b), scored with the native [[JaroWinkler]] expression on
    * `name`, and kept at `jw ≥ minSim`. Blocks larger than `maxBlock`
    * are dropped from candidate generation (see [[blockHealth]]).
    * Emits (id_a, id_b, name_a, name_b, jw rounded to 6dp). */
  def jwPairs(df: DataFrame, id: String, name: String,
              blockCols: Seq[String], minSim: Double,
              maxBlock: Int = 10000): DataFrame = {
    val base = df.select(col(id).cast("long").as("_id"),
      col(name).as("_nm"), concat_ws("", blockCols.map(col): _*).as("_blk"))
    // block-size gate as an anti-join against the OVERSIZED block list —
    // which is provably tiny (≤ n/maxBlock keys, vs. the ok-list's
    // unbounded block cardinality), so the broadcast holds at any scale
    val bad = base.groupBy("_blk").agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") > maxBlock).select("_blk")
    val in = base.join(broadcast(bad), Seq("_blk"), "left_anti")
    val a = in.select(col("_blk"), col("_id").as("id_a"), col("_nm").as("name_a"))
    val b = in.select(col("_blk"), col("_id").as("id_b"), col("_nm").as("name_b"))
    JaroWinkler.register(df.sparkSession)
    a.join(b, Seq("_blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jw", expr("graft_jaro_winkler(name_a, name_b)"))
      .filter(col("jw") >= minSim)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        round(col("jw"), 6).as("jw"))
  }

  /** Block-size health report: per-block record count and whether the
    * block exceeds `maxBlock` (and was therefore excluded from pairing).
    * The operator's scale dashboard — a skewed blocking key shows up here
    * before it shows up as a straggler task. */
  def blockHealth(df: DataFrame, blockCols: Seq[String],
                  maxBlock: Int = 10000): DataFrame =
    df.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("block_n"))
      .withColumn("overflow", (col("block_n") > maxBlock).cast("int"))

  /** Entity canonicalization: connected components over the [[jwPairs]]
    * match graph (match is symmetric but not transitive — components ARE
    * the entity decision), labels = component-minimum id via the
    * large/small-star method. Emits (id, cluster_id, cluster_size, keep)
    * with keep = 1 on the canonical (minimum-id) record — singletons come
    * out as their own entity, same contract as [[Dedup.starClusters]]. */
  def erEntities(df: DataFrame, id: String, name: String,
                 blockCols: Seq[String], minSim: Double,
                 maxBlock: Int = 10000): DataFrame = {
    val pairs = jwPairs(df, id, name, blockCols, minSim, maxBlock)
    Dedup.starClusters(df.select(col(id).cast("long").as(id)), pairs, id,
      idA = "id_a", idB = "id_b")
  }
}
