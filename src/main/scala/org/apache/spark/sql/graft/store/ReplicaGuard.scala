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
 */
package org.apache.spark.sql.graft.store

import scala.collection.concurrent.TrieMap

object ReplicaGuard {

  private val replicas = TrieMap.empty[String, Unit]

  /** Mark `name` as an attached read replica (idempotent). */
  def markReplica(name: String): Unit = replicas.put(name.toLowerCase, ())

  /** Clear replica status — an explicit CREATE / restore / DROP of the
    * name supersedes it (the caller is deliberately taking ownership).
    */
  def clear(name: String): Unit = replicas.remove(name.toLowerCase)

  def isReplica(name: String): Boolean = replicas.contains(name.toLowerCase)

  /** Refuse `op` if `name` is an attached read replica. */
  def requireWritable(name: String, op: String): Unit =
    require(!isReplica(name),
      s"$op($name): table is an attached read replica (attachTable) — " +
        "mutations would silently diverge from the publisher; mutate the " +
        "publishing table, or copy the data into a table of your own")
}
