package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.store.DictJoin

/** A/B equality for the dictionary-code join fast path
  * ([[org.apache.spark.sql.graft.store.DictJoin]]) against Spark's own
  * join on the identical inputs.
  */
class DictJoinSpec extends SparkTestBase {

  private def abCheck(table: String, key: String,
      build: org.apache.spark.sql.DataFrame, buildKey: String,
      joinType: String = "inner"): Unit = {
    val fast = DictJoin.dictJoin(spark, table, key, build, buildKey, joinType)
    val probe = org.apache.spark.sql.graft.store.GraftStoreOps.read(spark, table)
    val ref = probe.join(build, probe(key) === build(buildKey), joinType)
      .drop(build(buildKey))
    assert(fast.schema.map(f => (f.name, f.dataType)) ===
      ref.schema.map(f => (f.name, f.dataType)))
    val f = fast.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val r = ref.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(f.length === r.length)
    assert(f.toSeq === r.toSeq)
  }

  test("dict-encoded key: per-code memoized join equals Spark's join") {
    val g = GraftSession(spark)
    val orders = Tables.load(spark, sf, "orders")
    g.createTable("dj_orders", orders)
    // 5 distinct priorities -> dictionary-encoded column; dim carries a
    // DUPLICATE key (two rows for '1-URGENT') to exercise multi-match
    import spark.implicits._
    val dim = Seq(
      ("1-URGENT", 1, "hot"), ("1-URGENT", 1, "hot2"), ("2-HIGH", 2, "warm"),
      ("3-MEDIUM", 3, "mid"), ("5-LOW", 5, "cold"), ("9-NONE", 9, "never"))
      .toDF("prio", "rank", "label")
    abCheck("dj_orders", "o_orderpriority", dim, "prio")
    g.dropTable("dj_orders")
  }

  test("run-length-encoded key (sorted ingest) takes the dictionary path too") {
    val g = GraftSession(spark)
    import spark.implicits._
    // sorting by the key column produces runs -> the ingest picks RLE,
    // which the scan also surfaces as a dictionary-id vector
    val probe = (1 to 3000).map(i => (i.toLong, s"grp_${i % 4}"))
      .sortBy(_._2).toDF("id", "k")
    g.createTable("dj_rle", probe)
    val dim = Seq(("grp_0", 0), ("grp_1", 10), ("grp_2", 20), ("grp_3", 30))
      .toDF("bk", "v")
    abCheck("dj_rle", "k", dim, "bk")
    g.dropTable("dj_rle")
  }

  test("plain-encoded key falls back to per-row lookup, same answers") {
    val g = GraftSession(spark)
    import spark.implicits._
    // unique keys -> cardinality > n/4 -> the ingest stores PLAIN
    val probe = (1 to 2000).map(i => (i.toLong, s"key_$i")).toDF("id", "k")
    g.createTable("dj_plain", probe)
    val dim = (1 to 2000 by 3).map(i => (s"key_$i", i * 10)).toDF("bk", "v")
    abCheck("dj_plain", "k", dim, "bk")
    g.dropTable("dj_plain")
  }

  test("null probe keys and unmatched keys drop out (inner join)") {
    val g = GraftSession(spark)
    import spark.implicits._
    val probe = Seq((1L, "a"), (2L, null), (3L, "b"), (4L, "zzz"), (5L, "a"))
      .toDF("id", "k")
    g.createTable("dj_nulls", probe)
    val dim = Seq(("a", 10), ("b", 20), ("c", 30)).toDF("bk", "v")
    abCheck("dj_nulls", "k", dim, "bk")
    val got = DictJoin.dictJoin(spark, "dj_nulls", "k", dim, "bk")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.toSeq === Seq((1L, "a", 10), (3L, "b", 20), (5L, "a", 10)))
    g.dropTable("dj_nulls")
  }

  test("opt-in strategy rewrites df.join(dim) to DictJoinExec, same answers") {
    val g = GraftSession(spark)
    val orders = Tables.load(spark, sf, "orders")
    g.createTable("dj_strat", orders)
    import spark.implicits._
    val dim = Seq(("1-URGENT", 1), ("2-HIGH", 2), ("3-MEDIUM", 3),
      ("4-NOT SPECIFIED", 4), ("5-LOW", 5)).toDF("prio", "rank")
    val probe = org.apache.spark.sql.graft.store.GraftStoreOps.read(spark, "dj_strat")
    def q = probe.join(dim, probe("o_orderpriority") === dim("prio"))
      .groupBy("prio").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("rank").as("rm"))
      .orderBy("prio")
    val off = q.collect().toSeq
    try {
      spark.conf.set(org.apache.spark.sql.graft.store.DictJoinStrategy.CONF_KEY, "true")
      val dfOn = q
      val on = dfOn.collect().toSeq
      assert(dfOn.queryExecution.executedPlan.toString.contains("DictJoin"),
        dfOn.queryExecution.executedPlan.toString)
      assert(on === off)
      // guards: non-string key and oversized build sides keep Spark's join
      val idDim = (1L to 5L).toDF("o_orderkey2")
      val nonString = probe.join(idDim, probe("o_orderkey") === idDim("o_orderkey2"))
      assert(!nonString.queryExecution.executedPlan.toString.contains("DictJoin"))
    } finally {
      spark.conf.unset(org.apache.spark.sql.graft.store.DictJoinStrategy.CONF_KEY)
    }
    g.dropTable("dj_strat")
  }

  test("LEFT OUTER: null keys and misses null-extend (operator A/B)") {
    val g = GraftSession(spark)
    import spark.implicits._
    val probe = Seq((1L, "a"), (2L, null), (3L, "b"), (4L, "zzz"), (5L, "a"))
      .toDF("id", "k")
    g.createTable("dj_louter", probe)
    val dim = Seq(("a", 10), ("b", 20), ("c", 30)).toDF("bk", "v")
    abCheck("dj_louter", "k", dim, "bk", "left_outer")
    val got = DictJoin.dictJoin(spark, "dj_louter", "k", dim, "bk", "left")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2)))
    assert(got.toSeq === Seq((1L, "a", 10), (2L, null, -1), (3L, "b", 20),
      (4L, "zzz", -1), (5L, "a", 10)))
    // dict-encoded probe (few distinct keys, some unmatched) outer too
    val probe2 = (1 to 2000).map(i => (i.toLong, s"g${i % 5}")).toDF("id", "k")
    g.createTable("dj_louter2", probe2)
    val dim2 = Seq(("g0", 0), ("g2", 2)).toDF("bk", "v")
    abCheck("dj_louter2", "k", dim2, "bk", "left_outer")
    g.dropTable("dj_louter")
    g.dropTable("dj_louter2")
  }

  test("auto mode: fires only when the probe key is actually dict-encoded") {
    val g = GraftSession(spark)
    import spark.implicits._
    val K = org.apache.spark.sql.graft.store.DictJoinStrategy.CONF_KEY
    // 5-value priority column → dictionary-encoded at seal
    g.createTable("dj_auto_dict", Tables.load(spark, sf, "orders"))
    // all-unique key → dict tracking aborts, plain encoding at seal
    g.createTable("dj_auto_plain",
      (1 to 20000).map(i => (s"key_$i", i)).toDF("k", "v"))
    val dim = Seq(("1-URGENT", 1), ("2-HIGH", 2), ("3-MEDIUM", 3),
      ("4-NOT SPECIFIED", 4), ("5-LOW", 5)).toDF("prio", "rank")
    val hidim = (1 to 50).map(i => (s"key_$i", i)).toDF("hk", "r")
    def dictQ = {
      val p = org.apache.spark.sql.graft.store.GraftStoreOps.read(spark, "dj_auto_dict")
      p.join(dim, p("o_orderpriority") === dim("prio"))
    }
    def plainQ = {
      val p = org.apache.spark.sql.graft.store.GraftStoreOps.read(spark, "dj_auto_plain")
      p.join(hidim, p("k") === hidim("hk"))
    }
    val offDict = dictQ.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val offPlain = plainQ.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    try {
      spark.conf.set(K, "auto")
      val d = dictQ
      assert(d.queryExecution.executedPlan.toString.contains("DictJoin"),
        s"auto should fire on a dict-encoded key:\n${d.queryExecution.executedPlan}")
      assert(d.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq === offDict)
      val pl = plainQ
      assert(!pl.queryExecution.executedPlan.toString.contains("DictJoin"),
        s"auto must decline a plain-encoded key:\n${pl.queryExecution.executedPlan}")
      assert(pl.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq === offPlain)
      // mode=true keeps firing even on the plain key (per-row fallback)
      spark.conf.set(K, "true")
      val forced = plainQ
      assert(forced.queryExecution.executedPlan.toString.contains("DictJoin"))
      assert(forced.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq === offPlain)
    } finally spark.conf.unset(K)
    g.dropTable("dj_auto_dict"); g.dropTable("dj_auto_plain")
  }

  test("strategy: bare join output survives collect and sort (UnsafeRow consumers)") {
    // regression for the reused-JoinedRow output bug: with the strategy
    // on, a DictJoinExec at the plan ROOT feeds executeCollect's
    // getByteArrayRdd, and under an orderBy it feeds a shuffle's
    // UnsafeRowSerializer — both cast rows to UnsafeRow
    val g = GraftSession(spark)
    import spark.implicits._
    val probe = (1 to 500).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "k")
    g.createTable("dj_bare", probe)
    val dim = Seq(("g0", 0), ("g1", 10), ("g2", 20), ("g3", 30)).toDF("bk", "v")
    val p = org.apache.spark.sql.graft.store.GraftStoreOps.read(spark, "dj_bare")
    def q = p.join(dim, p("k") === dim("bk"))
    val off = q.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val offSorted = q.orderBy("id", "bk").collect().map(_.toSeq).toSeq
    try {
      spark.conf.set(org.apache.spark.sql.graft.store.DictJoinStrategy.CONF_KEY, "true")
      val bare = q
      assert(bare.queryExecution.executedPlan.toString.contains("DictJoin"),
        bare.queryExecution.executedPlan.toString)
      assert(bare.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq === off)
      assert(q.orderBy("id", "bk").collect().map(_.toSeq).toSeq === offSorted)
      // LEFT OUTER through the strategy: plan rewrites, answers match
      val probeL = p.join(dim, p("k") === dim("bk"), "left_outer")
      assert(probeL.queryExecution.executedPlan.toString.contains("DictJoin"),
        probeL.queryExecution.executedPlan.toString)
    } finally {
      spark.conf.unset(org.apache.spark.sql.graft.store.DictJoinStrategy.CONF_KEY)
    }
    g.dropTable("dj_bare")
  }

  test("strategy LEFT OUTER: null-extension equals Spark's left join") {
    val g = GraftSession(spark)
    import spark.implicits._
    val probe = Seq((1L, "a"), (2L, null), (3L, "b"), (4L, "zzz")).toDF("id", "k")
    g.createTable("dj_louter_strat", probe)
    val dim = Seq(("a", 10), ("b", 20)).toDF("bk", "v")
    val p = org.apache.spark.sql.graft.store.GraftStoreOps.read(spark, "dj_louter_strat")
    def q = p.join(dim, p("k") === dim("bk"), "left_outer").orderBy("id", "bk")
    val off = q.collect().map(_.toSeq).toSeq
    try {
      spark.conf.set(org.apache.spark.sql.graft.store.DictJoinStrategy.CONF_KEY, "true")
      val on = q
      assert(on.queryExecution.executedPlan.toString.contains("DictJoin"),
        on.queryExecution.executedPlan.toString)
      assert(on.collect().map(_.toSeq).toSeq === off)
    } finally {
      spark.conf.unset(org.apache.spark.sql.graft.store.DictJoinStrategy.CONF_KEY)
    }
    g.dropTable("dj_louter_strat")
  }

  test("LEFT SEMI / LEFT ANTI: existence probe equals Spark's semi/anti (operator A/B)") {
    val g = GraftSession(spark)
    import spark.implicits._
    // null probe key (semi drops it, anti KEEPS it — null never equals),
    // unmatched key, and a DUPLICATE build key ('a' twice: semi must
    // still emit each probe row once, not once per match)
    val probe = Seq((1L, "a"), (2L, null), (3L, "b"), (4L, "zzz"), (5L, "a"))
      .toDF("id", "k")
    g.createTable("dj_semi", probe)
    val dim = Seq(("a", 10), ("a", 11), ("b", 20), ("c", 30)).toDF("bk", "v")
    abCheck("dj_semi", "k", dim, "bk", "left_semi")
    abCheck("dj_semi", "k", dim, "bk", "left_anti")
    val semi = DictJoin.dictJoin(spark, "dj_semi", "k", dim, "bk", "left_semi")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(semi.toSeq === Seq((1L, "a"), (3L, "b"), (5L, "a")))
    val anti = DictJoin.dictJoin(spark, "dj_semi", "k", dim, "bk", "left_anti")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(anti.toSeq === Seq((2L, null), (4L, "zzz")))
    // dict-encoded probe (few distinct keys) through the memoized path
    val probe2 = (1 to 2000).map(i => (i.toLong, s"g${i % 5}")).toDF("id", "k")
    g.createTable("dj_semi2", probe2)
    val dim2 = Seq(("g0", 0), ("g2", 2)).toDF("bk", "v")
    abCheck("dj_semi2", "k", dim2, "bk", "left_semi")
    abCheck("dj_semi2", "k", dim2, "bk", "left_anti")
    g.dropTable("dj_semi")
    g.dropTable("dj_semi2")
  }

  test("strategy LEFT SEMI / LEFT ANTI: rewrites and equals Spark's join") {
    val g = GraftSession(spark)
    import spark.implicits._
    val probe = Seq((1L, "a"), (2L, null), (3L, "b"), (4L, "zzz"), (5L, "a"))
      .toDF("id", "k")
    g.createTable("dj_sa_strat", probe)
    val dim = Seq(("a", 10), ("b", 20)).toDF("bk", "v")
    val p = org.apache.spark.sql.graft.store.GraftStoreOps.read(spark, "dj_sa_strat")
    def qs = p.join(dim, p("k") === dim("bk"), "left_semi").orderBy("id")
    def qa = p.join(dim, p("k") === dim("bk"), "left_anti").orderBy("id")
    val offS = qs.collect().map(_.toSeq).toSeq
    val offA = qa.collect().map(_.toSeq).toSeq
    try {
      spark.conf.set(org.apache.spark.sql.graft.store.DictJoinStrategy.CONF_KEY, "true")
      val onS = qs
      assert(onS.queryExecution.executedPlan.toString.contains("DictJoin"),
        onS.queryExecution.executedPlan.toString)
      assert(onS.collect().map(_.toSeq).toSeq === offS)
      val onA = qa
      assert(onA.queryExecution.executedPlan.toString.contains("DictJoin"),
        onA.queryExecution.executedPlan.toString)
      assert(onA.collect().map(_.toSeq).toSeq === offA)
    } finally {
      spark.conf.unset(org.apache.spark.sql.graft.store.DictJoinStrategy.CONF_KEY)
    }
    g.dropTable("dj_sa_strat")
  }

  test("dictJoinAgg: agg-through-join reorder equals join-then-group (codes end-to-end)") {
    val g = GraftSession(spark)
    val orders = Tables.load(spark, sf, "orders")
    g.createTable("dja_orders", orders)
    import spark.implicits._
    val dim = Seq(("1-URGENT", 1, "hot"), ("2-HIGH", 2, "warm"),
      ("3-MEDIUM", 3, "mid"), ("4-NOT SPECIFIED", 4, "meh"), ("5-LOW", 5, "cold"))
      .toDF("prio", "rank", "label")
    val aggs = Seq(count(lit(1)).as("n"), sum("o_totalprice").as("rev"),
      max("o_orderdate").as("latest"))
    for (push <- Seq("true", "false")) {
      spark.conf.set("spark.sql.graft.aggPushdown", push)
      try {
        val fast = org.apache.spark.sql.graft.store.DictJoin.dictJoinAgg(
          spark, "dja_orders", "o_orderpriority", dim, "prio", aggs)
        val probe = org.apache.spark.sql.graft.store.GraftStoreOps.read(spark, "dja_orders")
        val ref = probe.join(dim, probe("o_orderpriority") === dim("prio"))
          .groupBy(probe("o_orderpriority"), dim("rank"), dim("label"))
          .agg(aggs.head, aggs.tail: _*)
        val f = fast.select("o_orderpriority", "rank", "label", "n", "rev", "latest")
          .collect().map(_.toSeq).sortBy(_.mkString("|"))
        val r = ref.select("o_orderpriority", "rank", "label", "n", "rev", "latest")
          .collect().map(_.toSeq).sortBy(_.mkString("|"))
        assert(f.toSeq === r.toSeq, s"push=$push")
      } finally spark.conf.unset("spark.sql.graft.aggPushdown")
    }
    // the reorder's validity guards: duplicate dim keys and build-side
    // aggregate references both fail fast instead of silently diverging
    val dupDim = Seq(("1-URGENT", 1), ("1-URGENT", 2)).toDF("prio", "rank")
    val e1 = intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.store.DictJoin.dictJoinAgg(
        spark, "dja_orders", "o_orderpriority", dupDim, "prio",
        Seq(count(lit(1)).as("n")))
    }
    assert(e1.getMessage.contains("not unique"))
    val e2 = intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.store.DictJoin.dictJoinAgg(
        spark, "dja_orders", "o_orderpriority", dim, "prio",
        Seq(sum(col("rank")).as("s")))
    }
    assert(e2.getMessage.contains("build side"))
    g.dropTable("dja_orders")
  }

  test("strategy fires on CATALOG reads too (g.table / spark.table path)") {
    // g.table returns the catalog read since r7 (KeyGroupedPartitioning);
    // the strategy must still recognize the scan under the eliminated
    // SubqueryAlias/View wrappers
    val g = GraftSession(spark)
    import spark.implicits._
    val probe = (1 to 400).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "k")
    g.createTable("dj_cat", probe)
    val dim = Seq(("g0", 0), ("g1", 10), ("g2", 20), ("g3", 30)).toDF("bk", "v")
    val p = g.table("dj_cat")
    def q = p.join(dim, p("k") === dim("bk"))
    val off = q.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    try {
      spark.conf.set(org.apache.spark.sql.graft.store.DictJoinStrategy.CONF_KEY, "true")
      val on = q
      assert(on.queryExecution.executedPlan.toString.contains("DictJoin"),
        on.queryExecution.executedPlan.toString)
      assert(on.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq === off)
    } finally {
      spark.conf.unset(org.apache.spark.sql.graft.store.DictJoinStrategy.CONF_KEY)
      g.dropTable("dj_cat")
    }
  }

  test("join after store mutations sees the mutated snapshot") {
    val g = GraftSession(spark)
    import spark.implicits._
    val probe = Seq((1L, "a"), (2L, "b"), (3L, "b"), (4L, "c")).toDF("id", "k")
    g.createTable("dj_mut", probe)
    g.update("dj_mut", col("id") === 3L, "k" -> lit("a"))
    g.delete("dj_mut", col("id") === 4L)
    val dim = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("bk", "v")
    abCheck("dj_mut", "k", dim, "bk")
    g.dropTable("dj_mut")
  }
}
