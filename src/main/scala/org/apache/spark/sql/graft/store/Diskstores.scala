package org.apache.spark.sql.graft.store

import scala.collection.concurrent.TrieMap

/** Named disk stores (reference `CREATE DISKSTORE`,
  * docs/reference/sql_reference/create-diskstore.md): a registered name
  * for a durable directory that persistence-minded tables target.
  *
  * Spark-first mapping — the reference's diskstore is BOTH the GemFire
  * oplog tier (overflow + persistence share files) and the recovery
  * root. Here those concerns are split deliberately: LRU OVERFLOW spill
  * stays in the managed executor-local temp tier (it is a cache, not
  * durability — re-rooting it onto a durable filesystem would tax every
  * eviction with remote IO), while the DISKSTORE is the durable
  * checkpoint root: a table created with `OPTIONS (diskstore 'name')`
  * checkpoints to `<dir>/<table>` by default
  * ([[graft.GraftSession.checkpointTable]] no-dir overload) and restores
  * from the same place. Oplog tuning options (MAXLOGSIZE, AUTOCOMPACT,
  * COMPACTIONTHRESHOLD, ...) are recorded and surfaced through
  * `sys.diskstores` but drive no behavior — they tune a file format
  * this engine doesn't have.
  */
object Diskstores {

  final case class DiskStore(name: String, dirs: Seq[String],
      props: Map[String, String])

  private val stores = TrieMap.empty[String, DiskStore]
  // table -> diskstore name, bound at CREATE TABLE ... OPTIONS(diskstore)
  private val bindings = TrieMap.empty[String, String]

  def create(name: String, dirs: Seq[String], props: Map[String, String],
      ifNotExists: Boolean): Unit = {
    val nm = name.toLowerCase
    if (stores.contains(nm)) {
      if (ifNotExists) return
      throw new IllegalArgumentException(s"diskstore already exists: $name")
    }
    // default directory mirrors the reference ("the working directory of
    // the member"): ./<name> under the JVM working dir
    val ds = if (dirs.nonEmpty) dirs else Seq(nm)
    ds.foreach { d =>
      val p = java.nio.file.Paths.get(d)
      java.nio.file.Files.createDirectories(p)
      require(java.nio.file.Files.isWritable(p),
        s"CREATE DISKSTORE $name: directory not writable: $d")
    }
    stores.put(nm, DiskStore(nm, ds, props))
  }

  def drop(name: String, ifExists: Boolean): Unit = {
    val nm = name.toLowerCase
    if (!stores.contains(nm)) {
      if (ifExists) return
      throw new IllegalArgumentException(s"diskstore not found: $name")
    }
    val bound = boundTables(nm)
    if (bound.nonEmpty) throw new IllegalStateException(
      s"DROP DISKSTORE $name: in use by table(s) ${bound.mkString(", ")}")
    stores.remove(nm)
  }

  def get(name: String): Option[DiskStore] = stores.get(name.toLowerCase)

  /** Bind a table to a named diskstore (CREATE TABLE validation: the
    * store must exist — an unknown name would silently lose the
    * persistence intent).
    */
  def bind(table: String, name: String): Unit = {
    val ds = get(name).getOrElse(throw new IllegalArgumentException(
      s"CREATE TABLE $table: DISKSTORE '$name' does not exist — " +
        "CREATE DISKSTORE it first"))
    bindings.put(table.toLowerCase, ds.name)
  }

  def unbind(table: String): Unit = bindings.remove(table.toLowerCase)

  def bindingOf(table: String): Option[DiskStore] =
    bindings.get(table.toLowerCase).flatMap(stores.get)

  def boundTables(name: String): Seq[String] =
    bindings.collect { case (t, n) if n == name.toLowerCase => t }.toSeq.sorted

  /** Default checkpoint location for a bound table: first dir + table
    * name. When no live binding exists (a FRESH JVM restoring a table it
    * never created), fall back to searching every registered diskstore
    * for an existing checkpoint of that name — re-register the diskstore
    * in the new process and `restoreTable(name)` finds its data, which
    * is the reference's recovery contract (diskstores outlive members).
    */
  def checkpointDir(table: String): Option[String] = {
    val t = table.toLowerCase
    bindingOf(t).map(ds => java.nio.file.Paths.get(ds.dirs.head, t).toString)
      .orElse(all.iterator.flatMap(_.dirs).map(java.nio.file.Paths.get(_, t))
        .find(p => java.nio.file.Files.exists(p.resolve("layout.properties")))
        .map(_.toString))
  }

  def all: Seq[DiskStore] = stores.values.toSeq.sortBy(_.name)
}
