package graft.operators

import org.apache.spark.sql.DataFrame

/** Per-round loop-state truncation for the iterative operators
  * ([[GraphQueries.pagerankConverged]], connected components), with a
  * durability dial mirroring the streaming state-provider dial
  * (StreamQueries `graft.state.provider`).
  *
  * Why truncate at all: a cached DataFrame keeps its full logical
  * plan, so round N's plan nests rounds 1..N-1 and planning time
  * grows per round. Checkpointing (either kind) truncates lineage to
  * the materialized partitions — constant planning cost per round.
  *
  * The dial — `graft.loop.checkpoint` sysprop or
  * `GRAFT_LOOP_CHECKPOINT` env:
  *
  *  - `local` (default): `localCheckpoint()` — blocks live on
  *    executors, no file I/O. Fastest, and the right harness/dev
  *    setting, but there is NO recompute path: lineage is gone and
  *    the blocks die with their executor, so on a real cluster one
  *    executor loss mid-loop kills the whole multi-round job.
  *  - `reliable`: `checkpoint()` to the SparkContext checkpoint dir
  *    (set lazily from `graft.checkpoint.dir` /
  *    `GRAFT_CHECKPOINT_DIR`). Each round's state is a file an
  *    executor loss can re-read, so the loop survives executor churn
  *    at the cost of one write+read of the state per round (measured
  *    in SCALING.md; the state is the O(nodes) vector, not the edge
  *    list, so the write is the small term of a round). On a LOCAL
  *    master only, an unset dir falls back to a driver temp dir (the
  *    dev/test convenience); on any other master the dial REFUSES to
  *    start rather than silently checkpointing to driver-local disk —
  *    a temp dir on the driver is not reliable storage on a cluster
  *    (executors cannot re-read it after loss), so the fallback would
  *    sell durability it does not deliver. Point the dir at
  *    HDFS/S3/NFS visible to every executor.
  *
  * Every round truncates eagerly regardless of mode: loop state has
  * multiple consumers per round (the convergence scan plus the next
  * round's join sides), so a lazily-carried plan would recompute the
  * round once per consumer. GraphSpec/DedupCollapseSpec certify the
  * loops are dial-invariant: both modes produce hash-identical
  * output, so flipping to `reliable` is a pure deployment decision.
  */
object LoopState {

  private def mode: String =
    sys.props.get("graft.loop.checkpoint")
      .orElse(sys.env.get("GRAFT_LOOP_CHECKPOINT")).getOrElse("local")

  private def reliable: Boolean = mode == "reliable"

  /** Checkpoint-dir decision for the reliable dial, factored pure so
    * the cluster refusal is unit-testable without a non-local
    * SparkContext. An explicit dir always wins; with none configured,
    * a local master gets a driver temp dir (tests, dev), and any
    * other master fails loudly naming both config keys — driver-local
    * temp masquerading as cluster-durable storage is the footgun this
    * guard exists for.
    */
  private[graft] def resolveCheckpointDir(
      master: String, explicit: Option[String]): String =
    explicit.getOrElse {
      require(
        master.startsWith("local"),
        s"GRAFT_LOOP_CHECKPOINT=reliable on master '$master' requires an " +
          "explicit checkpoint dir visible to every executor (HDFS/S3/NFS): " +
          "set the graft.checkpoint.dir sysprop or the GRAFT_CHECKPOINT_DIR " +
          "env var. Refusing the driver-local temp-dir fallback: executors " +
          "cannot re-read driver-local files after a loss, so it is not " +
          "reliable storage on a cluster.")
      java.nio.file.Files.createTempDirectory("graft-loop-ckpt").toString
    }

  /** Truncate `df`'s lineage eagerly per the dial. */
  def truncate(df: DataFrame): DataFrame =
    if (reliable) {
      val sc = df.sparkSession.sparkContext
      // setCheckpointDir is idempotent enough for our use (last call
      // wins); only set it when unset so callers/tests can pin it.
      if (sc.getCheckpointDir.isEmpty) {
        sc.setCheckpointDir(resolveCheckpointDir(
          sc.master,
          sys.props.get("graft.checkpoint.dir")
            .orElse(sys.env.get("GRAFT_CHECKPOINT_DIR"))))
      }
      df.checkpoint()
    } else df.localCheckpoint()

  /** Per-loop truncator that BOUNDS reliable-checkpoint storage: a
    * synchronous loop only ever restarts from its latest materialized
    * rounds, so old rounds' checkpoint files are dead weight — an
    * unbounded O(rounds × state) directory on a long-running loop
    * otherwise. Each [[Loop.truncate]] keeps the TWO most recent
    * truncations and deletes anything older, only after the new round
    * has fully materialized (checkpoint() here is eager), so every
    * instant has a complete restart point on storage. Two, not one:
    * a convergence exit may return the frame truncated one step
    * before the last (the components loop's changed==0 round returns
    * the PREVIOUS labels, not the just-materialized propagate), and
    * deleting it would leave the returned result reading deleted
    * files. No-op bookkeeping in local mode (executor block cleanup
    * is the ContextCleaner's job there).
    */
  def loop(): Loop = new Loop

  final class Loop private[LoopState] () {
    private var recent: List[String] = Nil // newest first, max 2 kept

    def truncate(df: DataFrame): DataFrame = {
      val out = LoopState.truncate(df)
      if (reliable) {
        checkpointFile(out).foreach { current =>
          val (keep, drop) = (current :: recent.filterNot(_ == current))
            .splitAt(2)
          for (stale <- drop) {
            // best-effort: a failed cleanup must never kill a correct
            // loop — the stale files are storage waste, not state
            try {
              val p = new org.apache.hadoop.fs.Path(stale)
              p.getFileSystem(out.sparkSession.sparkContext.hadoopConfiguration)
                .delete(p, true)
            } catch { case _: java.io.IOException => () }
          }
          recent = keep
        }
      }
      out
    }

    /** The reliable-checkpoint directory backing a just-truncated
      * frame: Dataset.checkpoint analyzes to a LogicalRDD over the
      * checkpointed internal RDD. None on an unexpected plan shape —
      * cleanup is then skipped (files kept; correctness unaffected).
      */
    private def checkpointFile(df: DataFrame): Option[String] =
      df.queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.getCheckpointFile
        case _ => None
      }
  }
}
