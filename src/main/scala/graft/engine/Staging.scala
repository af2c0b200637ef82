package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Pluggable staging policy for eager intermediate materialization.
  *
  * The fuzzy-dedup / ANN pipelines stage intermediates that feed multiple
  * consumers (a signature frame feeds the band join plus both verify
  * sides; the connected-components loop truncates lineage every round).
  * The staging must be EAGER — a lazy `persist()` lets consumers inside
  * one action race to compute the same subtree before the cache populates
  * (measured round 4: lazy caching made the 4-consumer ngram pipeline 4×
  * slower) — but HOW the materialized blocks are stored is a deployment
  * decision, not an operator decision:
  *
  *   - `local-checkpoint` (default on `local[...]`/`local-cluster`
  *     masters): executor-local blocks, lineage truncated. Fastest, and
  *     right for single-JVM / local[] runs — but on a multi-executor
  *     cluster an executor loss makes the blocks unrecoverable AND the
  *     lineage is gone, so the query dies instead of recomputing
  *     (measured: STAGING_FAULT.json).
  *   - `reliable-checkpoint` (default on every non-local master):
  *     blocks written to the checkpoint directory (HDFS/object store on
  *     a cluster), lineage truncated. Survives executor loss; the right
  *     setting for long 100 TB jobs.
  *   - `persist`: `MEMORY_AND_DISK` cache, materialized eagerly, lineage
  *     KEPT. Lost blocks recompute from lineage — cheaper than reliable
  *     checkpoints when upstream is a cheap scan, and no checkpoint dir
  *     needed. Not used inside unbounded loops (see [[stageIterative]]).
  *
  * Select with `spark.conf.set("spark.graft.staging", ...)` per session or
  * query; the checkpoint directory for `reliable-checkpoint` comes from
  * `spark.graft.staging.dir` (or an already-set `sc.setCheckpointDir`,
  * or a java.io.tmpdir fallback for local runs).
  *
  * Block lifetime: localCheckpoint and persist blocks both register in
  * `sc.getPersistentRDDs`; per-query harnesses (graft.Bench) release them
  * there. Reliable checkpoint files live until the checkpoint dir is
  * cleaned (`spark.cleaner.referenceTracking.cleanCheckpoints` or job-end
  * dir removal).
  */
object Staging {
  /** Runtime conf key selecting the policy. */
  val PolicyKey = "spark.graft.staging"
  /** Runtime conf key for the reliable-checkpoint directory. */
  val DirKey = "spark.graft.staging.dir"

  val LocalCheckpoint = "local-checkpoint"
  val ReliableCheckpoint = "reliable-checkpoint"
  val Persist = "persist"

  /** Default policy for a given master URL. Measured round 14
    * (STAGING_FAULT.json): local-checkpoint blocks are unrecoverable after
    * an executor loss AND the truncated lineage can't recompute them, so
    * the query dies — fine in `local[*]` (executor == driver JVM, no
    * independent loss mode) and acceptable in `local-cluster` (a test
    * topology), but a foot-gun on any real cluster. So the default is
    * topology-aware: local masters keep the fast executor-local blocks;
    * everything else (yarn, k8s, spark://, mesos) defaults to
    * reliable-checkpoint, which completed bit-identical under executor
    * kill -9 in the same fault matrix. An explicit `spark.graft.staging`
    * conf always wins over this resolution. */
  def defaultFor(master: String): String =
    if (master.startsWith("local")) LocalCheckpoint else ReliableCheckpoint

  private def policy(df: DataFrame): String = {
    val default = defaultFor(df.sparkSession.sparkContext.master)
    val p = df.sparkSession.conf.get(PolicyKey, default)
    require(Set(LocalCheckpoint, ReliableCheckpoint, Persist)(p),
      s"$PolicyKey must be one of $LocalCheckpoint|$ReliableCheckpoint|$Persist, got '$p'")
    p
  }

  /** Eagerly materialize a multi-consumer intermediate under the session's
    * staging policy. Semantics are identical across policies (the spec
    * pins this); only fault-tolerance and block placement differ. */
  def stage(df: DataFrame): DataFrame = policy(df) match {
    case LocalCheckpoint    => df.localCheckpoint(true)
    case ReliableCheckpoint => reliable(df)
    case Persist =>
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      p.count() // force now: consumers must hit the cache, not race to fill it
      p
  }

  /** Staging for ITERATIVE loops (connected components): every round's
    * output feeds the next round's plan, so the lineage must be truncated
    * — `persist` alone would grow the logical plan (and the analysis cost)
    * round over round. Under the `persist` policy the loop therefore
    * upgrades to a reliable checkpoint rather than silently keeping
    * lineage; `local-checkpoint` stays local. */
  def stageIterative(df: DataFrame): DataFrame = policy(df) match {
    case LocalCheckpoint => df.localCheckpoint(true)
    case _               => reliable(df)
  }

  private def reliable(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      val dir = df.sparkSession.conf.get(DirKey,
        new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-ckpt-${sc.applicationId}").getAbsolutePath)
      sc.setCheckpointDir(dir)
    }
    df.checkpoint(true)
  }
}
