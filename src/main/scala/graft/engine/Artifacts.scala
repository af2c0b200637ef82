package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Session-artifact memo — the build-once registry behind every
  * train-once/consume-many artifact (LSH signatures and clusters, k-means
  * centroids, n-gram models, DSIR weights, BPE merges).
  *
  * `TrieMap.getOrElseUpdate` evaluates its default OUTSIDE the map's
  * CAS, so two first-consumers racing on the same key would BOTH run the
  * builder — and every artifact builder writes overwrite-mode parquet to
  * a deterministic path, so a concurrent double-build can interleave two
  * writers on one directory and corrupt the read-back (ADVICE r10). The
  * sequential Verify/Bench harnesses never race, but the library must
  * not rely on that. [[Memo.once]] serializes builders behind a lock
  * while keeping the steady-state read lock-free. */
object Artifacts {

  /** Runtime conf key for the artifact root directory. Every session
    * artifact (and every persisted bucketed index table) writes under
    * this root. It must name a filesystem ALL executors can read —
    * HDFS / object store on a real cluster — because artifact builders
    * write from executors and consumers read back from executors. The
    * fallback is driver-local `java.io.tmpdir`, which is only correct
    * on single-JVM `local[*]` runs where driver and executors share a
    * filesystem (VERDICT r12: an unshared `file:` root scatters task
    * files across executor-local disks and the memoized read-back sees
    * partial data). Same convention as [[Staging.DirKey]]. */
  val DirKey = "spark.graft.artifacts.dir"

  /** The session's resolved artifact root (conf, else tmpdir). */
  def root(s: SparkSession): String =
    s.conf.get(DirKey,
      new java.io.File(sys.props("java.io.tmpdir")).getAbsolutePath)

  /** Deterministic artifact path for a (kind, corpus-dir) pair, scoped
    * by applicationId so concurrent sessions sharing one root never
    * collide. Hadoop `Path` composition keeps scheme'd roots
    * (`hdfs://…`, `s3a://…`) intact where `java.io.File` would not. */
  def path(s: SparkSession, kind: String, sfDir: String): String =
    new Path(root(s),
      s"graft-$kind-${s.sparkContext.applicationId}-${math.abs(sfDir.hashCode)}")
      .toString

  /** External-table location for a persisted bucketed index table (NOT
    * appId-scoped: the saved index is the durable cross-session form —
    * `saveIndex`/`loadIndex` pairs span sessions by design, so the
    * location must be stable by name).
    *
    * The durable-by-name location lives under the artifact root ONLY
    * when [[DirKey]] is set explicitly — an operator who configures a
    * shared root is opting into cross-session sharing and owns the name
    * space. Without it the location falls back to the session WAREHOUSE
    * dir (per-cwd `spark-warehouse`), NOT the host-shared
    * `java.io.tmpdir` [[root]] fallback: [[freshTableLocation]] deletes
    * the location before every overwrite, so a tmpdir default would let
    * two unrelated sessions on one host (concurrent CI runs, a bench
    * beside a verify) delete each other's live index files mid-read
    * (ADVICE r13) — the warehouse default restores the isolation
    * managed tables always had. */
  def tablePath(s: SparkSession, table: String): String = {
    val base = s.conf.getOption(DirKey)
      .getOrElse(s.conf.get("spark.sql.warehouse.dir"))
    new Path(base, s"graft-table-$table").toString
  }

  /** Recursively delete a path before an external-table overwrite:
    * `saveAsTable(Overwrite)` drops the CATALOG entry but leaves an
    * external table's files, and the re-create refuses a non-empty
    * location. */
  def clearPath(s: SparkSession, p: String): Unit = {
    val hp = new Path(p)
    hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
    ()
  }

  /** Resolve AND clear the external location for a bucketed index table
    * about to be overwritten — the one-liner every `save*Index` uses:
    * `.option("path", Artifacts.freshTableLocation(s, name))`. */
  def freshTableLocation(s: SparkSession, table: String): String = {
    val loc = tablePath(s, table)
    clearPath(s, loc)
    loc
  }

  /** A memo whose builder runs EXACTLY once per key.
    *
    * Reads after the first build take the lock-free fast path; only the
    * cold build serializes (on the registry, not per key — builds are
    * rare, long, and Spark-job-bound, so cross-key serialization costs
    * nothing measurable and keeps the implementation one line). */
  final class Memo[K, V] {
    private val m = new scala.collection.concurrent.TrieMap[K, V]
    def once(k: K)(build: => V): V =
      m.get(k).getOrElse(synchronized(m.getOrElseUpdate(k, build)))
  }
}
