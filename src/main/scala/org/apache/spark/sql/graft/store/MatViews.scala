/*
 * Materialized views over store tables: registry, freshness fingerprints,
 * and the write guard.
 *
 * Reference scope: the reference ships AQP sample tables and TopK
 * structures as its "pre-computed summary" tier (SnappySession
 * .createSampleTable, createApproxTSTopK) and routes queries to them by
 * rewrite. This file is the EXACT-summary sibling of that tier: a
 * materialized aggregate the optimizer transparently substitutes when —
 * and only when — the store can prove the summary still equals the base
 * table. Where the reference's sample routing trades accuracy for speed
 * under WITH ERROR, a matview trades nothing: the rewrite fires only on
 * a proven-fresh view, so it is invisible to results.
 *
 * 100 TB shape: a GROUP BY over a 100 TB fact table becomes a scan of a
 * dimension-cardinality summary. Freshness proof is metadata-only (batch
 * ids + per-batch mutation fingerprints already resident on the driver),
 * so the check costs O(batches) map lookups, never a scan. REFRESH after
 * pure appends is O(delta): only the new batches are aggregated and
 * merged through the keyed-upsert path (the same asymptotics as the
 * live-store incremental publish, PERF_NOTES §26).
 */
package org.apache.spark.sql.graft.store

import scala.collection.concurrent.TrieMap

object MatViews {

  /** One aggregate of the defining query, in SELECT order.
    * `func`: sum | count | count_star | min | max | avg.
    * `input`: base-table column name ("" for count_star).
    * `resultName`: the user's output alias (display only — the rewrite
    * matches STRUCTURE, not names).
    */
  final case class MvAgg(func: String, input: String, resultName: String)

  /** Freshness fingerprint of the base table at the point the view's
    * contents were (re)computed: the live batch-id set plus each batch's
    * mutation state (delete bitmap id + update delta ids). Payload ids
    * never recycle, so fingerprint equality PROVES no mutation committed
    * since — the same proof [[GraftColumnStore.StoreTable.swapRefs]]
    * uses to guard maintenance rewrites.
    */
  final case class MvFreshness(
      refIds: Set[Long],
      fp: Map[Long, (Option[Long], Vector[Long])])

  /** Join shape of a STAR-SCHEMA view (None = single-table view).
    * `tables` is the sorted full table set (including `base`); `conds`
    * the canonical sorted `` `t`.`a` = `u`.`b` `` equi-join conjuncts
    * (the rewrite matches a query's join SET against them — order-free,
    * so optimizer join reorder cannot hide a match); `fresh` the
    * PER-TABLE fingerprints at the last (re)build — a mutation in ANY
    * joined table stales the view.
    */
  final case class MvJoin(
      tables: Seq[String],
      conds: Seq[String],
      fresh: Map[String, MvFreshness])

  final case class MvDef(
      name: String, // matview's own store table (lowercase)
      base: String, // base store table (lowercase; the FIRST/fact table for join views)
      groupCols: Seq[String], // bare storage column names
      aggs: Seq[MvAgg],
      sql: String, // defining SELECT, display only
      fresh: MvFreshness,
      // defining-query WHERE as canonical `` `col` <op> <literal> ``
      // conjuncts, op ∈ {=, >=, <=, >, <} (empty = unfiltered view;
      // `` `t`.`col` <op> lit `` for join views; BETWEEN stores as its
      // >=/<= pair). Canonical strings serve both sides of the
      // contract: the rewrite matches a query's conjuncts against them
      // VERBATIM (exact containment — no implication engine), and
      // build/refresh re-applies them to the base scan via expr().
      // See [[MatViewSupport.canonicalEq]].
      predicate: Seq[String] = Nil,
      joins: Option[MvJoin] = None,
      // canonical `t.col` per groupCols position (join views only;
      // empty for single-table views) — the rewrite matches QUALIFIED
      // group identity, storage keeps the bare names (required
      // unambiguous across the joined tables at CREATE)
      groupQual: Seq[String] = Nil,
      // set when a refresh whose CONTENT reflects scan-time truth
      // (partial / full rebuild) detected a base mutation racing it —
      // the recorded fingerprint then describes an OLDER state than the
      // stored rows, so no delta path may trust it: the next refresh
      // must rebuild (and the rewrite must not serve, belt-and-braces;
      // the fingerprint mismatch already blocks it)
      dirty: Boolean = false) {
    def allTables: Seq[String] = joins.map(_.tables).getOrElse(Seq(base))
  }

  private val views = TrieMap.empty[String, MvDef]

  // maintained beside the map so the optimizer rule's per-Aggregate
  // join gate is one volatile read, like [[nonEmpty]] — never a
  // snapshot/sort of the registry on the planning hot path
  private val joinViews = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Delete-bitmap payload ids a view's freshness fingerprints
    * reference — what [[register]] pins so the repeat-delete
    * subtractive refresh can still diff "current bitmap minus recorded
    * bitmap" after applyDeletes supersedes the recorded payload.
    */
  private def bitmapIdsOf(mv: MvDef): Set[Long] =
    (mv.joins.map(_.fresh.values.toSeq).getOrElse(Nil) :+ mv.fresh)
      .iterator.flatMap(_.fp.valuesIterator.flatMap(_._1)).toSet

  def register(mv: MvDef): Unit = {
    // pin the NEW freshness's bitmap payloads before unpinning the
    // old registration's — overlapping ids keep a net refcount ≥ 1
    // throughout, so a concurrent release can never slip between
    bitmapIdsOf(mv).foreach(GraftColumnStore.BatchRegistry.pinBitmap)
    val old = views.put(mv.name.toLowerCase, mv)
    old.foreach(o =>
      bitmapIdsOf(o).foreach(GraftColumnStore.BatchRegistry.unpinBitmap))
    val delta = (if (mv.joins.isDefined) 1 else 0) -
      (if (old.exists(_.joins.isDefined)) 1 else 0)
    if (delta != 0) joinViews.addAndGet(delta)
  }

  def unregister(name: String): Option[MvDef] = {
    val old = views.remove(name.toLowerCase)
    old.foreach(o =>
      bitmapIdsOf(o).foreach(GraftColumnStore.BatchRegistry.unpinBitmap))
    if (old.exists(_.joins.isDefined)) joinViews.decrementAndGet()
    old
  }

  /** Allocation-free gate for the join-rewrite path. */
  def hasJoinViews: Boolean = joinViews.get() > 0

  def get(name: String): Option[MvDef] = views.get(name.toLowerCase)

  def isMatView(name: String): Boolean = views.contains(name.toLowerCase)

  /** Every registered view over `base`, registration-order-free (sorted
    * by name so rewrite candidate order is deterministic).
    */
  def on(base: String): Seq[MvDef] =
    views.valuesIterator.filter(_.base == base.toLowerCase).toSeq.sortBy(_.name)

  /** Every view that involves `table` anywhere in its definition —
    * lifecycle fan-out (cascades, auto-refresh) for join views.
    */
  def involving(table: String): Seq[MvDef] =
    views.valuesIterator.filter(_.allTables.contains(table.toLowerCase))
      .toSeq.sortBy(_.name)

  def all: Seq[MvDef] = views.values.toSeq.sortBy(_.name)

  /** Allocation-free emptiness gate for the optimizer rule's hot path. */
  def nonEmpty: Boolean = !views.isEmpty

  /** Current fingerprint of `base`'s live batch set — captured BEFORE
    * the build/refresh scan so anything landing during the scan can only
    * make the view conservatively stale, never falsely fresh (ids never
    * recycle, so a mutation can't restore an old fingerprint).
    */
  def fingerprint(snap: GraftColumnStore.TableSnapshot): MvFreshness = {
    val ids = snap.liveRefs.map(_.id).toSet
    MvFreshness(ids, snap.mutationState(ids))
  }

  private def tableMatches(table: String, f: MvFreshness): Boolean =
    GraftColumnStore.get(table).exists { t =>
      val snap = t.snapshot
      val live = snap.liveRefs.map(_.id).toSet
      live == f.refIds && snap.mutationState(live) == f.fp
    }

  /** Metadata-only freshness proof: the view's contents equal its
    * defining query iff EVERY base table's live batch set and per-batch
    * mutation state are EXACTLY what the last (re)build recorded.
    */
  def isFresh(mv: MvDef): Boolean = !mv.dirty && (mv.joins match {
    case Some(j) => j.tables.forall(t =>
      j.fresh.get(t).exists(f => tableMatches(t, f)))
    case None => tableMatches(mv.base, mv.fresh)
  })

  // ---- maintenance serialization ------------------------------------------

  // One lock per view name, JVM-wide: two concurrent REFRESHes computing
  // the same delta would each merge it (the second reads rows the first
  // already merged → double-applied increments) and then RECORD the new
  // fingerprint — a corrupt view that PROVES fresh. Serializing
  // create/refresh/drop per name removes the interleaving; the second
  // refresh re-reads the registry inside the lock and no-ops.
  private val locks = TrieMap.empty[String, Object]

  def withMaintenanceLock[T](name: String)(f: => T): T =
    locks.getOrElseUpdate(name.toLowerCase, new Object).synchronized(f)

  // ---- write guard -------------------------------------------------------

  // refresh/rebuild write through the normal store paths on the calling
  // thread; the maintenance scope lets exactly those writes through
  private val maintenance = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  def inMaintenance[T](f: => T): T = {
    maintenance.set(maintenance.get + 1)
    try f finally maintenance.set(maintenance.get - 1)
  }

  /** Refuse direct writes to a matview's backing table — its contents
    * are derived; a user write would silently diverge the view from its
    * own freshness proof (the rewrite would then serve corrupt rows as
    * if verified). DROP + recreate, or mutate the base and REFRESH.
    */
  def guardWrite(name: String): Unit =
    require(maintenance.get > 0 || !isMatView(name),
      s"write($name): table is a materialized view over '" +
        get(name).map(_.base).getOrElse("?") +
        "' — mutate the base table and REFRESH MATERIALIZED VIEW instead")
}
