package org.apache.spark.sql.graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Epoch-versioned checkpoint publishing: the two-process serving story
  * (the reference's smart-connector mode — a store cluster keeps
  * ingesting while connector JVMs serve reads from consistent snapshots,
  * `cluster/.../gemxd/SparkSQLExecuteImpl.scala:63`,
  * docs/affinity_modes/connector_mode.md). The Spark-first redesign is a
  * commit-marker protocol over shared storage rather than a live data
  * grid: the writer publishes immutable `epoch_N/` directories under a
  * diskstore root and a reader JVM attaches READ-ONLY to the newest
  * committed epoch — so reads are always of a full, published snapshot,
  * and the snapshot a reader serves ADVANCES as the writer commits.
  *
  * Atomicity: an epoch directory is written completely (data parquet +
  * layout + `epoch.properties` content fingerprint) BEFORE its
  * `_COMMITTED` marker is created; readers enumerate only marked epochs,
  * so a torn or in-flight epoch is invisible — there is no rename or
  * pointer-swap to need filesystem-specific atomicity. The fingerprint
  * (row count + order-independent content hash) lets the reader prove
  * the restored snapshot is exactly what the writer published.
  *
  * Retention stands in for cross-process reader leases (in-JVM leases
  * are [[LeaseGc]]'s job; distributed lease coordination is an ops
  * non-goal, SURVEY §7): `keep` committed epochs survive a publish, so a
  * reader attaching the latest epoch has `keep-1` publish cycles of
  * margin before its files age out — and an attach COPIES into the
  * reader's own registry, so the window only covers the restore read
  * itself, not the serving lifetime.
  *
  * 100 TB scale audit — stated, not hidden: an epoch here is a FULL
  * snapshot (one table scan written as parquet, re-read once for the
  * fingerprint), which is right for correctness-first serving and for
  * dimension/serving tables, but publish cost is O(table) — at 100 TB
  * on a minutes cadence that is the wrong shape. The scale path is the
  * same commit protocol over INCREMENTAL state: persist sealed batch
  * payloads once (content-addressed, they are immutable), make the
  * epoch a MANIFEST of batch refs + delete/update overlay ids (exactly
  * [[GraftColumnStore.TableSnapshot]]'s content), and fingerprint the
  * manifest instead of the rows — publish becomes O(delta since last
  * epoch), attach becomes O(manifest) + lazy payload fetch, and the
  * marker/claim/retention machinery here carries over unchanged. Not
  * built because every consumer in this repo serves snapshot-sized
  * tables; the protocol boundary (marker-last visibility, fingerprint
  * verification, claim-then-write) is the part a scale-up must keep.
  */
object LiveCheckpoint {

  val MARKER = "_COMMITTED"
  val EPOCH_PROPS = "epoch.properties"
  private val EpochName = "epoch_(\\d{8})".r

  private def epochDirName(n: Long): String = f"epoch_$n%08d"

  /** Path of one epoch's directory (for sidecar readers — everything in
    * it is immutable once the marker exists).
    */
  def dirFor(root: String, epoch: Long): String = s"$root/${epochDirName(epoch)}"

  private def fs(spark: SparkSession, root: String) = {
    val p = new org.apache.hadoop.fs.Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Committed epoch numbers under `root`, ascending (uncommitted /
    * in-flight directories are skipped — that is the torn-snapshot
    * guarantee).
    */
  def committedEpochs(spark: SparkSession, root: String): Seq[Long] = {
    val (f, p) = fs(spark, root)
    if (!f.exists(p)) return Nil
    f.listStatus(p).iterator
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case EpochName(n) if f.exists(
          new org.apache.hadoop.fs.Path(s.getPath, MARKER)) => Some(n.toLong)
        case _ => None
      })
      .toSeq.sorted
  }

  def latestEpoch(spark: SparkSession, root: String): Option[Long] =
    committedEpochs(spark, root).lastOption

  /** Order-independent content fingerprint of a dataframe: row count and
    * the sum of per-row 32-bit hashes (widened, so the sum cannot
    * overflow below ~2^32 rows). Both sides — publisher over the written
    * parquet, reader over the restored store table — compute it the same
    * way, so equality proves the attach re-hydrated exactly the
    * published multiset.
    */
  def fingerprint(df: DataFrame): (Long, Long) = {
    val cols = df.columns.map(col).toSeq
    val r = df.agg(count(lit(1)).as("n"),
      coalesce(sum(hash(cols: _*).cast("bigint")), lit(0L)).as("h")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Publish the table's current snapshot as the next committed epoch.
    * The fingerprint is computed from the WRITTEN parquet, not the live
    * table — the table may take more commits while this runs, and the
    * manifest must describe the bytes a reader will actually attach.
    * Returns the epoch number.
    */
  def publish(spark: SparkSession, table: String, root: String,
      keep: Int = 4, beforeCommit: String => Unit = _ => ()): Long = {
    require(keep >= 1, "retention must keep at least the newest epoch")
    // exclusive epoch claim: two publishers racing one root would both
    // compute max+1 and co-write the same directory — claim the number
    // with a create-no-overwrite file (atomic on Hadoop filesystems)
    // and advance past already-claimed epochs (claimed-but-uncommitted
    // dirs of a crashed publisher stay invisible to readers forever;
    // numbers never recycle, so skipping them is free)
    val (f0, _) = fs(spark, root)
    f0.mkdirs(new org.apache.hadoop.fs.Path(root))
    // Filesystem note: create(overwrite=false) is atomic on HDFS; on
    // RawLocalFileSystem and most object stores it is check-then-create,
    // so exclusivity there is best-effort (fine for the single-writer-
    // per-root deployments this targets; use an HDFS-semantics store for
    // true multi-publisher racing).
    var next = math.max(
      latestEpoch(spark, root).map(_ + 1).getOrElse(0L), 0L)
    var claimed = false
    var contended = 0
    while (!claimed) {
      try {
        f0.create(new org.apache.hadoop.fs.Path(root, s".claim_${epochDirName(next)}"),
          false).close()
        claimed = true
      } catch {
        // only "file already exists" means another publisher won the
        // number — any other IOException (permissions, connectivity)
        // would repeat forever if treated as contention, so it
        // propagates. ChecksumFileSystem wraps the local case in a
        // plain IOException whose message carries the path, hence the
        // message probe beside the typed catch.
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
            _: java.nio.file.FileAlreadyExistsException =>
          next += 1; contended += 1
        case e: java.io.IOException
            if e.getMessage != null && e.getMessage.contains("exists") =>
          next += 1; contended += 1
      }
      // bound the walk: a pathological root with an unbounded run of
      // claimed-but-uncommitted numbers means something is wrong with
      // the deployment, not this publisher — refuse loudly
      require(contended < 10000,
        s"publish($table): gave up after $contended contended epoch claims " +
          s"under $root — stale .claim_* files or a runaway publisher")
    }
    val dir = s"$root/${epochDirName(next)}"
    // both stores serve in connector mode; the layout manifest records
    // the provider, so attach dispatches without being told
    if (GraftRowStore.get(table).isDefined) GraftRowOps.checkpoint(spark, table, dir)
    else GraftStoreOps.checkpoint(spark, table, dir)
    val (rows, h) = fingerprint(spark.read.parquet(s"$dir/data"))
    GraftManifest.write(spark, dir, Seq(
      "epoch" -> next.toString,
      "rows" -> rows.toString,
      "content_hash" -> h.toString,
      "table" -> table),
      s"epoch $next of $table", EPOCH_PROPS)
    // sidecars (e.g. the session's constraints file) must land BEFORE
    // the marker, or a reader could attach an epoch missing them
    beforeCommit(dir)
    // marker LAST: everything a reader needs exists before the epoch
    // becomes visible
    val (f, _) = fs(spark, root)
    f.create(new org.apache.hadoop.fs.Path(dir, MARKER), true).close()
    // retention: drop committed epochs beyond the newest `keep` (and
    // their claim files — numbers never recycle, so this cannot free a
    // number for re-claiming, it only keeps the root tidy)
    val committed = committedEpochs(spark, root)
    committed.dropRight(keep).foreach { old =>
      f.delete(new org.apache.hadoop.fs.Path(s"$root/${epochDirName(old)}"), true)
      f.delete(new org.apache.hadoop.fs.Path(root, s".claim_${epochDirName(old)}"), false)
    }
    next
  }

  /** Attach the newest committed epoch READ-ONLY: restore it into this
    * JVM's registry under `table` and verify the restored content
    * against the published fingerprint (count + content hash) — a torn
    * or partially-visible snapshot fails here rather than serving wrong
    * answers. Returns the epoch served.
    */
  def attachLatest(spark: SparkSession, table: String, root: String): Long = {
    val e = latestEpoch(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed epoch under $root"))
    attach(spark, table, root, e)
    e
  }

  def attach(spark: SparkSession, table: String, root: String, epoch: Long): Unit = {
    val dir = s"$root/${epochDirName(epoch)}"
    val props = GraftManifest.readOpt(spark, dir, EPOCH_PROPS).getOrElse(
      throw new IllegalStateException(s"epoch $epoch has no manifest under $root"))
    val isRow = GraftManifest.read(spark, dir).getProperty("provider", "column") == "row"
    val restored =
      if (isRow) GraftRowOps.restore(spark, table, dir)
      else GraftStoreOps.restore(spark, table, dir)
    val (rows, h) = fingerprint(restored)
    val (wantRows, wantH) =
      (props.getProperty("rows").toLong, props.getProperty("content_hash").toLong)
    if (rows != wantRows || h != wantH) {
      // do not leave a known-bad snapshot registered as servable
      if (isRow) GraftRowStore.drop(table) else GraftColumnStore.drop(table)
      throw new IllegalStateException(
        s"torn snapshot at epoch $epoch: restored ($rows, $h) != published ($wantRows, $wantH)")
    }
  }
}
