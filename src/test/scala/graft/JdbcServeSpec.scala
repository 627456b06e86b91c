package graft

import org.apache.spark.sql.functions._

/** JDBC client surface (the reference's primary interface: clients
  * connect over JDBC and route SQL through the network layer to the
  * lead node's Spark driver — `cluster/.../gemxd/SparkSQLExecuteImpl
  * .scala:63`, docs/howto: "connect using JDBC driver"). Spark-first
  * equivalent: Spark's own Thrift/JDBC endpoint started on this
  * driver (`HiveThriftServer2.startWithContext`) — a real out-of-
  * process-protocol round trip over a localhost socket with the stock
  * Hive JDBC driver. The graft DSv2 catalog rides session confs, and
  * the store registry is JVM-global, so a fresh JDBC session sees and
  * mutates the SAME store tables this session serves.
  */
class JdbcServeSpec extends SparkTestBase {

  // the Thrift server is once-per-JVM (a second startWithContext never
  // binds) — share one across the suite's tests
  private lazy val port: Int = {
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("jdbc_meta").toString)
    val p = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    spark.conf.set("hive.server2.thrift.port", p.toString)
    spark.conf.set("hive.server2.thrift.bind.host", "localhost")
    org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    p
  }

  private def connect(): java.sql.Connection = {
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    var conn: java.sql.Connection = null
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (conn == null) {
      try conn = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://localhost:$port/", "", "")
      catch {
        case e: java.sql.SQLException =>
          if (System.nanoTime() > deadline) throw e
          Thread.sleep(250)
      }
    }
    conn
  }

  test("a JDBC client queries and mutates graft store tables over the wire") {
    val g = GraftSession(spark)
    import spark.implicits._
    g.sql("CREATE TABLE jdbc_t (k bigint, v string) USING column " +
      "OPTIONS (partition_by 'k', buckets '4')")
    g.insert("jdbc_t", (1L to 100L).map(i => (i % 4, s"v$i")).toDF("k", "v"))

    val conn = connect()
    try {
      locally {
        val st = conn.createStatement()
        // read the store table through the DSv2 catalog from the
        // CLIENT's own session (catalog + extensions ride session confs)
        val rs = st.executeQuery(
          "SELECT k, count(*) AS n FROM graft.jdbc_t GROUP BY k ORDER BY k")
        val got = Iterator.continually(rs)
          .takeWhile(_.next()).map(r => (r.getLong(1), r.getLong(2))).toSeq
        assert(got == Seq((0L, 25L), (1L, 25L), (2L, 25L), (3L, 25L)), got.toString)
        // DML over the wire lands in the SAME store this session reads
        assert(st.executeUpdate(
          "INSERT INTO graft.jdbc_t VALUES (9, 'from_jdbc')") >= 0)
        assert(g.sql("SELECT count(*) FROM jdbc_t WHERE k = 9")
          .head().getLong(0) == 1L)
        // and a replica attached in THIS session refuses the client's
        // write too — the store-level guard crosses protocol boundaries
        val root = java.nio.file.Files.createTempDirectory("jdbc_rep").toString
        g.publishTable("jdbc_t", root)
        g.attachTable("jdbc_rep", root)
        val e = intercept[java.sql.SQLException](st.executeUpdate(
          "INSERT INTO graft.jdbc_rep VALUES (1, 'x')"))
        assert(e.getMessage.contains("read replica"), e.getMessage)
        g.dropTable("jdbc_rep")
      }
    } finally {
      conn.close()
      g.dropTable("jdbc_t")
    }
  }

  test("a pure-JDBC client drives the full serving lifecycle: create, load, publish, attach view, read") {
    // the graft PARSER rides spark.sql.extensions into the server-side
    // session, so a SQL-only client needs no Scala at all — exactly the
    // reference's deployment (applications speak JDBC to the cluster)
    val conn = connect()
    try {
      locally {
        val st = conn.createStatement()
        val root = java.nio.file.Files.createTempDirectory("jdbc_root").toString
        st.execute("CREATE TABLE jdbc_pub (k bigint, v bigint) USING column " +
          "OPTIONS (partition_by 'k', buckets '4')")
        st.executeUpdate("INSERT INTO graft.jdbc_pub " +
          "SELECT id % 4, id * 2 FROM range(1000)")
        def one(q: String): Long = {
          val rs = st.executeQuery(q); assert(rs.next()); rs.getLong(1)
        }
        assert(one(s"PUBLISH TABLE jdbc_pub INCREMENTAL TO '$root'") == 0L)
        st.execute("DELETE FROM jdbc_pub WHERE v < 400")
        assert(one(s"PUBLISH TABLE jdbc_pub INCREMENTAL TO '$root'") == 1L)
        // zero-copy view over the wire: latest epoch reflects the delete
        assert(one(s"ATTACH VIEW jdbc_view FROM '$root' VERIFY") == 1L)
        assert(one("SELECT count(*) FROM jdbc_view") == 800L)
        // pinned epoch 0 answers pre-delete — time travel over JDBC
        assert(one(s"ATTACH VIEW jdbc_view0 FROM '$root' EPOCH 0") == 0L)
        assert(one("SELECT count(*) FROM jdbc_view0") == 1000L)
      }
    } finally {
      conn.close()
      org.apache.spark.sql.graft.store.GraftColumnStore.drop("jdbc_pub")
    }
  }

  test("a pure-JDBC client drives the matview lifecycle: create, serve, refresh O(delta)") {
    // materialized views are a STORE-level registry + an optimizer rule
    // riding spark.sql.extensions, so a SQL-only client gets the full
    // lifecycle — create, transparent serving (EXPLAIN-asserted over the
    // wire), freshness introspection, incremental refresh — with no
    // Scala on either end
    val conn = connect()
    try {
      locally {
        val st = conn.createStatement()
        st.execute("CREATE TABLE jdbc_mvb (k bigint, v bigint) USING column " +
          "OPTIONS (partition_by 'k', buckets '4')")
        st.executeUpdate("INSERT INTO graft.jdbc_mvb SELECT id % 5, id FROM range(1000)")
        st.execute("CREATE MATERIALIZED VIEW jdbc_mvs AS " +
          "SELECT k, sum(v) AS sv, count(*) AS n FROM jdbc_mvb GROUP BY k")
        def rows(q: String): Seq[Seq[String]] = {
          val rs = st.executeQuery(q)
          val n = rs.getMetaData.getColumnCount
          Iterator.continually(rs).takeWhile(_.next())
            .map(r => (1 to n).map(r.getString)).toSeq
        }
        // the plan the CLIENT gets is the summary scan, not the base
        val plan = rows("EXPLAIN SELECT k, sum(v) AS sv FROM jdbc_mvb GROUP BY k")
          .flatten.mkString("\n")
        assert(plan.contains("jdbc_mvs"), s"rewrite missing over JDBC:\n$plan")
        // sum over k-residue class r of range(1000): 99500 + 200r
        val expect1 = (0 to 4).map(r => Seq(s"$r", s"${99500 + 200 * r}", "200"))
        assert(rows("SELECT k, sum(v) AS sv, count(*) AS n FROM jdbc_mvb " +
          "GROUP BY k ORDER BY k") == expect1)
        assert(rows("SELECT is_fresh FROM sys.matviews WHERE name = 'jdbc_mvs'")
          == Seq(Seq("true")))
        // append over the wire → stale (visible in sys.matviews), then
        // REFRESH takes the O(delta) path and serving resumes
        st.executeUpdate("INSERT INTO graft.jdbc_mvb SELECT id % 5, id " +
          "FROM range(1000, 1200)")
        assert(rows("SELECT is_fresh FROM sys.matviews WHERE name = 'jdbc_mvs'")
          == Seq(Seq("false")))
        assert(rows("REFRESH MATERIALIZED VIEW jdbc_mvs") == Seq(Seq("incremental")))
        // range(1000,1200): residue r gains sum 43900+40r, count 40
        val expect2 = (0 to 4).map(r =>
          Seq(s"$r", s"${99500 + 200 * r + 43900 + 40 * r}", "240"))
        assert(rows("SELECT k, sum(v) AS sv, count(*) AS n FROM jdbc_mvb " +
          "GROUP BY k ORDER BY k") == expect2)
        st.execute("DROP MATERIALIZED VIEW jdbc_mvs")
      }
    } finally {
      conn.close()
      org.apache.spark.sql.graft.store.GraftColumnStore.drop("jdbc_mvb")
    }
  }
}
