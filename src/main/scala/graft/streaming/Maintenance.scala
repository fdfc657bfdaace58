package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ONE maintenance campaign across every maintained index family — the
  * [[Takedown]] contract on the KEEP-IT-HEALTHY axis.
  *
  * Operational reality: a deployment running all five families (lexical
  * postings, IVF vector store, PQ code table, dedup signature bands,
  * graph-ANN store) runs the same loop on each — fold increments when
  * they pile up, watch the aging monitor, rebuild when it breaches.
  * Running that as five hand-sequenced calls invites partial sweeps (one
  * family's monitor never read = silent recall decay there). This
  * wrapper drives every targeted family's OWN trigger and — the
  * [[Takedown.land]] lesson — RETURNS the per-family outcomes instead of
  * discarding them, so the caller can verify the sweep actually covered
  * the fleet.
  *
  * Semantics are exactly each family's own fold / monitor / rebuild
  * primitives (this object adds no new state, no new locking — each
  * family action serializes on its root's write lease as always). Run
  * between streams, like all maintenance.
  *
  * At 100 TB: [[foldIfNeeded]] costs one directory listing per calm
  * family; [[driftReport]] is five parameter-bounded aggregates (layers,
  * bands, subquantizers, cells — never corpus-pair work); [[driftSweep]]
  * adds the rebuilds only where a monitor breached.
  */
object Maintenance {

  /** Per-family drift thresholds for [[driftSweep]] — each knob is the
    * SAME number the family's own `*IfDrifted` trigger takes, defaulting
    * to disabled (+∞: monitor runs, never breaches) so a caller arms
    * exactly the axes it watches. The lexical family has two axes
    * (content OOV mass, corpus growth), per
    * [[graft.text.LexIndex.rebuildIfDrifted]]. */
  final case class DriftPolicy(
      lexOovOccFrac: Double = Double.PositiveInfinity,
      lexGrowthFrac: Double = Double.PositiveInfinity,
      annMaxDrift: Double = Double.PositiveInfinity,
      pqMaxL1: Double = Double.PositiveInfinity,
      dedupMaxDrift: Double = Double.PositiveInfinity,
      graphMaxDrift: Double = Double.PositiveInfinity)

  /** The PQ family's retrain inputs: its 16 B/row code table cannot
    * reconstruct training vectors, so a codebook retrain needs the live
    * corpus handed in ([[graft.sim.PqIndex.retrainIndexIfDrifted]]'s
    * signature) — required whenever `Targets.pq` is set. */
  final case class PqRetrain(corpus: DataFrame, id: String, emb: String,
                             m: Int, ksub: Int)

  /** Run every targeted family's fold trigger: fold iff more than
    * `maxIncrements` live increment directories (or tombstone batches)
    * have accumulated there — each family's own `compact*IfNeeded`.
    * Returns the per-family acted map (true = that family folded). */
  def foldIfNeeded(spark: SparkSession, t: Takedown.Targets,
                   maxIncrements: Int): Map[String, Boolean] = {
    // five independent triggers on five disjoint roots — run them
    // concurrently (guide §2.6; each fold holds its own root's lease)
    val tasks: Seq[(String, () => Boolean)] =
      t.lex.map(d => "lex" -> (() => {
        val (p, dl) = graft.text.LexIndex.compactIndexIfNeeded(spark, d,
          maxIncrements)
        p > 0 || dl > 0
      })).toSeq ++
      t.ann.map(d => "ann" -> (() =>
        StreamingAnn.compactIndexIfNeeded(spark, d, maxIncrements) > 0)) ++
      t.pq.map(d => "pq" -> (() =>
        graft.sim.PqIndex.compactIndexIfNeeded(spark, d, maxIncrements) > 0)) ++
      t.dedup.map(d => "dedup" -> (() =>
        graft.text.Dedup.compactSignatureIndexIfNeeded(spark, d,
          maxIncrements) > 0)) ++
      t.graph.map(d => "graph" -> (() => {
        val (v, e) = graft.sim.GraphAnnIndex.compactIndexIfNeeded(spark, d,
          maxIncrements)
        v > 0 || e > 0
      }))
    scala.collection.immutable.ListMap(
      graft.ops.Par.map(tasks) { case (f, run) => f -> run() }: _*)
  }

  /** The campaign-wide aging readout: every targeted family's drift
    * monitor normalized to ONE frame — (family, axis, drift) — the
    * [[Takedown.attest]] shape on the drift axis. Axes are each
    * monitor's own support (graph layers, dedup bands, PQ subquantizers,
    * IVF cells, the lexical fractions); `drift` is the family's own
    * number (NULL where the monitor reports NULL — a drained IVF cell,
    * a lexical index with nothing streamed in). As with the underlying
    * monitors, gate on [[Compaction.incrementCount]] before alarming on
    * a family with no live increments (base-vs-nothing reads as full
    * drift by construction). */
  def driftReport(spark: SparkSession, t: Takedown.Targets): DataFrame = {
    def norm(family: String, df: DataFrame, axis: org.apache.spark.sql.Column,
             drift: org.apache.spark.sql.Column): DataFrame =
      df.select(lit(family).as("family"), axis.cast("string").as("axis"),
        drift.cast("double").as("drift"))
    val parts =
      t.lex.map { d =>
        val s = graft.text.LexIndex.statsDrift(spark, d)
        norm("lex", s, lit("oov_term_frac"), col("oov_term_frac"))
          .unionByName(norm("lex", s, lit("oov_occ_frac"),
            col("oov_occ_frac")))
          .unionByName(norm("lex", s, lit("growth_frac"),
            col("n_docs_inc").cast("double") /
              greatest(col("n_docs_base"), lit(1L)).cast("double")))
      } ++
      t.ann.map(d => norm("ann", StreamingAnn.cellDrift(spark, d),
        concat(lit("cell:"), col("cid")), col("drift"))) ++
      t.pq.map(d => norm("pq", graft.sim.PqIndex.codeUsageDrift(spark, d),
        concat(lit("sub:"), col("s")), col("l1_drift"))) ++
      t.dedup.map(d =>
        norm("dedup", graft.text.Dedup.bandOccupancyDrift(spark, d),
          concat(lit("band:"), col("band_idx")), col("l1_drift"))) ++
      t.graph.map(d =>
        norm("graph", graft.sim.GraphAnnIndex.bucketDrift(spark, d),
          concat(lit("layer:"), col("layer")), col("l1_drift")))
    require(parts.nonEmpty, "maintenance driftReport: no family targeted")
    parts.reduce(_.unionByName(_))
  }

  /** Run every targeted family's monitor→act drift loop under `policy`
    * and return the per-family acted map (true = monitor breached, index
    * rebuilt under its fresh geometry/layout; false = calm, index
    * untouched). The lex/pq/dedup/graph triggers gate on live increments
    * (a just-folded family sweeps false), so acting re-baselines them;
    * the ann monitor is FIT-based (stored centroids vs current member
    * means — each recluster is one Lloyd step), so at a tight threshold
    * it may act on consecutive sweeps until the refinement converges.
    * `pqRetrain` is required when the PQ family is targeted (see
    * [[PqRetrain]]). */
  def driftSweep(spark: SparkSession, t: Takedown.Targets,
                 policy: DriftPolicy,
                 pqRetrain: Option[PqRetrain] = None): Map[String, Boolean] = {
    require(t.pq.isEmpty || pqRetrain.isDefined,
      "maintenance driftSweep: the PQ family needs PqRetrain (its code " +
        "table cannot reconstruct training vectors)")
    // five independent monitor→act loops on five disjoint roots — run
    // them concurrently (guide §2.6; rebuilds hold their own root's lease)
    val tasks: Seq[(String, () => Boolean)] =
      t.lex.map(d => "lex" -> (() => graft.text.LexIndex.rebuildIfDrifted(
        spark, d, policy.lexOovOccFrac, policy.lexGrowthFrac))).toSeq ++
      t.ann.map(d => "ann" -> (() =>
        StreamingAnn.reclusterIfDrifted(spark, d, policy.annMaxDrift))) ++
      (for (d <- t.pq; r <- pqRetrain) yield "pq" -> (() =>
        graft.sim.PqIndex.retrainIndexIfDrifted(spark, d,
          r.corpus, r.id, r.emb, r.m, r.ksub, policy.pqMaxL1))) ++
      t.dedup.map(d => "dedup" -> (() =>
        graft.text.Dedup.rebuildSignatureIndexIfDrifted(spark, d,
          policy.dedupMaxDrift))) ++
      t.graph.map(d => "graph" -> (() =>
        graft.sim.GraphAnnIndex.rebuildIfDrifted(spark, d,
          policy.graphMaxDrift)))
    scala.collection.immutable.ListMap(
      graft.ops.Par.map(tasks) { case (f, run) => f -> run() }: _*)
  }
}
