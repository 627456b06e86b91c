package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference SnappyJoinSuite's idea: assert WHICH physical join plan
  * each table-layout pairing produces (NorthWindTest validates plan
  * choice per layout the same way). Pins the layout→plan contract:
  *  - small replicated-style table ⋈ bucketed fact → BroadcastHashJoin;
  *  - co-bucketed same key/count → exchange-free (ColocationSpec owns
  *    the deep version; asserted here as part of the matrix);
  *  - bucket-count MISMATCH → exactly one side shuffles, and it is the
  *    SMALLER-bucket side (EnsureRequirements aligns to the larger
  *    count — the PERF_NOTES §13 discovery behind "provision buckets >=
  *    shuffle.partitions", frozen as a regression test);
  *  - bucketed on DIFFERENT keys → the key-mismatched side must
  *    re-shuffle even though both report bucketing.
  */
class JoinStrategySpec extends SparkTestBase {
  private val fmt = "org.apache.spark.sql.graft.store.GraftColumnSource"

  private def mk(table: String, n: Int, buckets: Int, bucketBy: String): Unit = {
    val df = spark.range(n).select((col("id") % 97).as("k"),
      (col("id") % 31).as("j"), col("id").as("v"))
    val w = df.write.format(fmt).option("table", table)
    (if (buckets > 0) w.option("partition_by", bucketBy)
        .option("buckets", buckets.toString)
     else w).mode("overwrite").save()
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Exchange nodes whose subtree scans the given graftstore table. */
  private def exchangesOver(df: DataFrame, table: String): Int = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike
          if e.toString.contains(s"graftstore.$table") => e
    }.size
  }

  /** Force the non-broadcast planner paths AND a concrete (non-AQE)
    * physical plan, so per-side Exchange placement is inspectable —
    * AdaptiveSparkPlanExec hides its inner plan from collect().
    */
  private def noBroadcast[A](f: => A): A = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("small dimension x bucketed fact plans a BroadcastHashJoin") {
    mk("js_dim", 50, 0, "")
    mk("js_fact", 20000, 8, "k")
    val j = spark.table("graft.js_fact")
      .join(spark.table("graft.js_dim"), "k")
    assert(plan(j).contains("BroadcastHashJoin"), plan(j))
    assert(j.count() > 0)
  }

  test("co-bucketed tables (same key, same count) join with zero exchanges") {
    noBroadcast {
      mk("js_a8", 10000, 8, "k")
      mk("js_b8", 10000, 8, "k")
      val j = spark.table("graft.js_a8").groupBy("k").agg(sum("v").as("sa"))
        .join(spark.table("graft.js_b8").groupBy("k").agg(sum("v").as("sb")), "k")
      assert(!plan(j).contains("Exchange"), plan(j))
      assert(j.count() == 97)
    }
  }

  test("bucket-count mismatch forfeits storage partitioning: BOTH sides re-shuffle") {
    noBroadcast {
      mk("js_a4", 10000, 4, "k")
      mk("js_b16", 10000, 16, "k")
      val j = spark.table("graft.js_a4")
        .join(spark.table("graft.js_b16"), "k")
      // bucket(4) and bucket(16) are INCOMPATIBLE KeyGroupedPartitionings:
      // unlike classic Hive bucketing (which aligns to the larger count),
      // SPJ offers no cross-count alignment — both sides fall back to a
      // hash shuffle at spark.sql.shuffle.partitions. This is why co-
      // joined store tables must be CO-PROVISIONED with one bucket count
      // (COLOCATE_WITH inherits it for exactly this reason); the
      // PERF_NOTES §13 "larger side wins" rule is about a KGP side vs an
      // already-hash-distributed side, not KGP vs KGP.
      assert(exchangesOver(j, "js_a4") == 1,
        s"4-bucket side must shuffle:\n${plan(j)}")
      assert(exchangesOver(j, "js_b16") == 1,
        s"16-bucket side must also shuffle (no cross-count alignment):\n${plan(j)}")
      assert(j.count() > 0)
      // ...and the rescue: spark.sql.sources.v2.bucketing.shuffle.enabled
      // lets Spark shuffle ONE side into the other's grouping — the
      // smaller-bucket side realigns into the larger count, the
      // 16-bucket side stays in place (the recommended conf for mixed-
      // bucket-count store deployments; see README 100 TB notes)
      spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      try {
        val j2 = spark.table("graft.js_a4")
          .join(spark.table("graft.js_b16"), "k")
        assert(exchangesOver(j2, "js_a4") == 1,
          s"smaller-bucket side still shuffles:\n${plan(j2)}")
        assert(exchangesOver(j2, "js_b16") == 0,
          s"larger-bucket side must stay in place:\n${plan(j2)}")
        assert(j2.count() > 0)
      } finally spark.conf.unset("spark.sql.sources.v2.bucketing.shuffle.enabled")
    }
  }

  test("same bucket count but different keys: the key-mismatched pairing shuffles") {
    noBroadcast {
      mk("js_k8", 10000, 8, "k")
      mk("js_j8", 10000, 8, "j")
      val j = spark.table("graft.js_k8")
        .join(spark.table("graft.js_j8"), "k")
      // js_j8 is bucketed by j, joined on k — its reported partitioning
      // cannot satisfy the join, so at least that side re-distributes
      assert(plan(j).contains("Exchange"), plan(j))
      assert(j.count() > 0)
    }
  }
}
