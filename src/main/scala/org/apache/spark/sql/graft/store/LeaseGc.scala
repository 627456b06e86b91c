package org.apache.spark.sql.graft.store

import scala.collection.mutable

/** Reader-lease payload GC shared by the column and row stores.
  *
  * Mutations swap an immutable table snapshot; payloads the new snapshot
  * no longer references ("retirees") must stay resolvable until every
  * reader that planned against an older snapshot has finished. The
  * reference provides this through region-version GC on its distributed
  * store; this single-JVM registry provides it with explicit reader
  * leases (replacing round 4's one-mutation "epoch lag", which a fast
  * writer — e.g. a CDC sink committing every ~50 ms — could outrun while
  * a long scan was still draining).
  *
  * Protocol:
  *  - `pin()` — taken when a scan captures its snapshot (inside the
  *    table's mutate lock, so snapshot and lease epoch agree).
  *  - `seal(id, n)` — at `planInputPartitions`, with the planned
  *    partition count. Runtime-filter re-planning may seal again with a
  *    new count (no readers have started by then).
  *  - `releaseOne(id)` — from each `PartitionReader.close()`; the lease
  *    drops when the last planned partition closes.
  *  - `onSwap(retirees)` — from inside the table's mutate lock (swap and
  *    retiree recording are ATOMIC — two concurrent commits can no
  *    longer interleave swap/retire and shrink each other's grace).
  *    Retirees free once no live lease is pinned at or before the epoch
  *    they retired at.
  *
  * A plan that is costed or explained but never executed would pin its
  * lease forever (physical planning triggers partition planning, so such
  * leases ARE sealed — a count of open partitions that will never run).
  * Each lease therefore tracks its owner objects (the Scan, and the
  * reader factory if one was created) with a [[java.lang.ref.Cleaner]]:
  * when every owner is unreachable, no further reader can possibly be
  * created against the lease, and it force-drops — the same
  * reachability-driven reclamation Spark's ContextCleaner applies to
  * shuffle and broadcast state. While a query runs, its Dataset keeps
  * the scan reachable and running tasks keep the factory reachable, so
  * live readers are never unpinned.
  *
  * All methods are O(live leases) and driver-side (the store registry is
  * single-JVM; executors in local mode share it).
  */
final class LeaseGc[R](free: R => Unit) {
  private final class Lease(val epoch: Long) {
    /** -1 = unsealed (planning); otherwise partitions still open. */
    var outstanding: Int = -1
    /** Owner objects registered; 0 owners + cleaner fired = abandoned. */
    var owners: Int = 0
  }

  private var epoch = 0L
  private var nextId = 0L
  private val leases = mutable.Map.empty[Long, Lease]
  private var pending = Vector.empty[(Long, R)] // (retireEpoch, retirees)

  /** Called holding the owning table's lock (see class doc). */
  def onSwap(retirees: Option[R]): Unit = synchronized {
    retirees.foreach(r => pending :+= (epoch -> r))
    epoch += 1
    drain()
  }

  /** Called holding the owning table's lock, with its current snapshot. */
  def pin(): Long = synchronized {
    nextId += 1
    leases(nextId) = new Lease(epoch)
    nextId
  }

  def seal(id: Long, partitions: Int): Unit = synchronized {
    leases.get(id).foreach { l =>
      l.outstanding = partitions
      if (partitions <= 0) { leases -= id; drain() }
    }
  }

  def releaseOne(id: Long): Unit = synchronized {
    leases.get(id).foreach { l =>
      if (l.outstanding > 0) {
        l.outstanding -= 1
        if (l.outstanding == 0) { leases -= id; drain() }
      }
    }
  }

  /** Register `owner` as keeping lease `id` alive; when ALL registered
    * owners become unreachable the lease force-drops (abandoned plan).
    */
  def addOwner(id: Long, owner: AnyRef): Unit = {
    synchronized { leases.get(id).foreach(_.owners += 1) }
    LeaseGc.cleaner.register(owner, () => ownerGone(id))
  }

  private def ownerGone(id: Long): Unit = synchronized {
    leases.get(id).foreach { l =>
      l.owners -= 1
      if (l.owners <= 0) { leases -= id; drain() }
    }
  }

  /** Drop everything (table drop / replace). */
  def flushAll(): Unit = synchronized {
    pending.foreach { case (_, r) => free(r) }
    pending = Vector.empty
    leases.clear()
  }

  /** Live leases + pending retiree sets — spec telemetry. */
  def stats: (Int, Int) = synchronized { (leases.size, pending.size) }

  private def drain(): Unit = {
    val minEpoch =
      if (leases.isEmpty) Long.MaxValue else leases.valuesIterator.map(_.epoch).min
    val (freeNow, keep) = pending.partition(_._1 < minEpoch)
    pending = keep
    freeNow.foreach { case (_, r) => free(r) }
  }
}

object LeaseGc {
  /** One daemon cleaner thread for all store tables. */
  private val cleaner = java.lang.ref.Cleaner.create()
}
