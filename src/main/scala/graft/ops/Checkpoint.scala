package graft.ops

import org.apache.spark.sql.DataFrame

/** Materialization cut honoring the deployment's checkpoint policy —
  * the one place every operator family's lineage cuts route through.
  *
  * `localCheckpoint` by default (executor-memory blocks, no write
  * barrier — right for static executors); a RELIABLE `checkpoint` on the
  * session's checkpoint dir when `spark.graft.reliableCheckpoint` is
  * true (survives executor loss under dynamic allocation / preemption).
  * CheckpointSpec pins value-identity between the two modes.
  */
object Checkpoint {
  def cut(df: DataFrame, eager: Boolean): DataFrame =
    if (df.sparkSession.conf
          .get("spark.graft.reliableCheckpoint", "false").toBoolean)
      df.checkpoint(eager)
    else df.localCheckpoint(eager)
}
