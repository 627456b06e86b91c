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
  * Lease lifetime is REACHABILITY of the plan objects, nothing else:
  *
  *  - `pin()` — taken when a scan captures its snapshot (inside the
  *    table's mutate lock, so snapshot and lease epoch agree).
  *  - `addOwner(id, o)` — registers the Scan (and later the reader
  *    factory) as lease owners via [[java.lang.ref.Cleaner]]; when ALL
  *    owners are unreachable no reader can ever be created (or
  *    re-created) against the lease, and it drops.
  *  - `onSwap(retirees)` — from inside the table's mutate lock (swap and
  *    retiree recording are ATOMIC). Retirees free once no live lease is
  *    pinned at or before the epoch they retired at.
  *
  * Earlier versions ALSO dropped the lease when the last planned
  * partition reader closed ("seal with partition count at
  * planInputPartitions, count down on reader close"). That was unsound
  * twice over: (a) a Spark physical plan is MULTI-execution — a cached
  * Dataset re-runs the same BatchScanExec with its cached partitions and
  * never re-plans, so counting one execution's closes frees payloads a
  * second execution still needs; (b) a retried task closes a NEW reader
  * for the SAME partition, double-counting the release and freeing
  * payloads while sibling partitions are mid-read. Reachability has
  * neither problem — while any Dataset (or running task) can still reach
  * the scan, the lease holds. This is exactly the discipline Spark's own
  * ContextCleaner applies to shuffle and broadcast state: prompt frees
  * are traded for GC-driven certainty. Callers that need deterministic
  * reclamation points run `System.gc()` (as graft.Bench does between
  * queries).
  *
  * All methods are O(live leases) and driver-side (the store registry is
  * single-JVM; executors in local mode share it).
  */
final class LeaseGc[R](free: R => Unit) {
  private final class Lease(val epoch: Long) {
    /** Owner objects registered; reaches 0 only via Cleaner callbacks. */
    var owners: Int = 0
    /** True once at least one owner was ever registered — guards the
      * window between pin() and the first addOwner, during which an
      * owners==0 lease must NOT be treated as abandoned.
      */
    var owned: Boolean = false
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

  /** Register `owner` as keeping lease `id` alive; when ALL registered
    * owners become unreachable the lease drops and its epoch stops
    * pinning retirees.
    */
  def addOwner(id: Long, owner: AnyRef): Unit = {
    synchronized {
      leases.get(id).foreach { l => l.owners += 1; l.owned = true }
    }
    LeaseGc.cleaner.register(owner, () => ownerGone(id))
  }

  private def ownerGone(id: Long): Unit = synchronized {
    leases.get(id).foreach { l =>
      l.owners -= 1
      if (l.owners <= 0 && l.owned) { leases -= id; drain() }
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
  private val cleaner = java.lang.ref.Cleaner.create()
}
