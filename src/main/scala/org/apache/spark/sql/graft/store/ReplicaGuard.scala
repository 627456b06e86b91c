/*
 * Store-level read-replica registry.
 *
 * Tables brought in via `attachTable` are READ REPLICAS of a publisher's
 * epoch (reference connector-mode tables write THROUGH to the store,
 * docs/affinity_modes/connector_mode.md — an epoch copy cannot): a local
 * mutation would silently diverge the replica from the publisher. The
 * session face guards its own entry points, but DSv2 writes reach the
 * store without a session (`INSERT INTO graft.t`, `df.write.format(...)`)
 * — so replica status lives HERE, at the store layer, and every write
 * builder / catalog mutation / store-ops mutator checks it. Names are
 * normalized lowercase store names.
 *
 * Provenance lives BESIDE enforcement: which root + epoch the replica
 * serves, through which face (table copy vs zero-copy view), whether a
 * view is pinned to a specific epoch, and which session attached it.
 * `sys.replicas` reads this registry, so the operational answer to "why
 * is this table read-only" is visible from EVERY session in the JVM —
 * the guard and the introspection can never disagree (they are one map).
 */
package org.apache.spark.sql.graft.store

import scala.collection.concurrent.TrieMap

object ReplicaGuard {

  /** Provenance of one attached replica: the publish root and epoch it
    * serves, the attach face (`table` = restored store copy, `view` =
    * zero-copy parquet view), whether the epoch was explicitly pinned
    * (vs newest-at-attach), and the attaching session's id.
    */
  final case class ReplicaInfo(root: String, epoch: Long, mode: String,
      pinned: Boolean, ownerSession: String)

  private val replicas = TrieMap.empty[String, ReplicaInfo]

  /** Mark `name` as an attached read replica (idempotent; a re-attach
    * replaces the provenance — e.g. a view advancing to a newer epoch).
    */
  def markReplica(name: String, info: ReplicaInfo): Unit =
    replicas.put(name.toLowerCase, info)

  /** Guard-only mark for callers with no provenance to record (tests,
    * non-epoch replicas).
    */
  def markReplica(name: String): Unit =
    markReplica(name, ReplicaInfo("", -1L, "table", pinned = false, ""))

  /** Clear replica status — an explicit CREATE / restore / DROP of the
    * name supersedes it (the caller is deliberately taking ownership).
    */
  def clear(name: String): Unit = replicas.remove(name.toLowerCase)

  def isReplica(name: String): Boolean = replicas.contains(name.toLowerCase)

  def infoOf(name: String): Option[ReplicaInfo] = replicas.get(name.toLowerCase)

  /** Every replica in the JVM with its provenance, sorted by name —
    * the `sys.replicas` backing store.
    */
  def all: Seq[(String, ReplicaInfo)] = replicas.toSeq.sortBy(_._1)

  /** Refuse `op` if `name` is an attached read replica. */
  def requireWritable(name: String, op: String): Unit =
    require(!isReplica(name),
      s"$op($name): table is an attached read replica (attachTable) — " +
        "mutations would silently diverge from the publisher; mutate the " +
        "publishing table, or copy the data into a table of your own")
}
