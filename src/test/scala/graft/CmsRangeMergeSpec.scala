package graft

import org.apache.spark.sql.functions._

/** Range queries over the time-series top-k store
  * ([[GraftSession.createApproxTSTopK]] / `queryApproxTSTopK`) — the
  * Hokusai semantics (reference docs/sde/sketching.md): one CMS sketch
  * per epoch, a [start, end) query MERGES the epoch sketches. Counters
  * are additive, so the merged answer must equal a single sketch built
  * over the union of the epochs' rows — and a key that is big IN
  * AGGREGATE but never inside any single epoch's top-k must still
  * surface (the property the materialized per-epoch top-k rows
  * fundamentally cannot provide).
  */
class CmsRangeMergeSpec extends SparkTestBase {

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("multi-epoch range == epoch-union recomputation; aggregate-heavy key surfaces") {
    val g = GraftSession(spark)
    import spark.implicits._
    // day-d heroes a_d_1..a_d_5 (100 events each, per-day top-5) and a
    // SPREAD key at 60/day: rank 6 inside every day, rank 1 over any
    // 2-day range (120 > 100)
    val rows = for {
      day <- 1 to 4
      (key, n) <- (1 to 5).map(i => (s"a${day}_$i", 100)) :+ (("spread", 60))
      j <- 1 to n
    } yield (s"$day/$key/$j", ts(day), key)
    val events = rows.toDF("event_id", "ts", "user_key")
    g.createApproxTSTopK("tk_rm", events, "user_key", "ts", "1 day", 5)
    try {
      // per-epoch MATERIALIZED top-5 provably excludes the spread key...
      assert(g.table("tk_rm").filter(col("key") === "spread").isEmpty)
      // ...but the sketch-merge range query puts it FIRST over days 2-3
      val got = g.queryApproxTSTopK("tk_rm",
          "2024-01-02 00:00:00", "2024-01-04 00:00:00", 5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got.head == ("spread", 120L), s"got $got")
      // equivalence: identical to recomputing ONE sketch over the union
      // of the two epochs' raw rows (same k/width/depth)
      val union = events
        .filter(col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-04 00:00:00").cast("timestamp"))
        .agg(org.apache.spark.sql.graft.CmsTopKAggregate
          .approx_topk(col("user_key"), 5).as("topk"))
        .select(posexplode(col("topk")))
        .select(col("col.key"), col("col.count"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == union, s"merge diverged from union recompute:\n$got\n$union")
      // full-range sanity: spread dominates everything at 240
      val all = g.queryApproxTSTopK("tk_rm",
          "2024-01-01 00:00:00", "2024-01-05 00:00:00", 3)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(all.head == ("spread", 240L), s"got $all")
    } finally {
      g.dropTable("tk_rm"); g.dropTable("tk_rm_sketches")
    }
  }

  test("merge validates sketch dimensions; a genuine 1x1 sketch is not the empty sentinel") {
    import spark.implicits._
    import org.apache.spark.sql.graft.CmsTopKAggregate._
    val df = (1 to 50).map(i => (s"k${i % 5}", i % 2)).toDF("key", "part")
    // sketches of different DEPTH must refuse to merge (counters are
    // positional: adding cells of different hash layouts silently
    // corrupts counts). Divisible WIDTHS are legal — the merge folds the
    // wider down (Hokusai decay support, see the decay test below)
    val s1 = df.filter(col("part") === 0)
      .agg(approx_topk_state(col("key"), 3, 4096, 5).as("st"))
    val s2 = df.filter(col("part") === 1)
      .agg(approx_topk_state(col("key"), 3, 4096, 4).as("st"))
    val e = intercept[Exception](
      s1.union(s2).agg(approx_topk_merge(col("st"), 3)).collect())
    def deepMsg(t: Throwable): String = {
      var c: Throwable = t; val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    assert(deepMsg(e).contains("incompatible sketch dimensions"), deepMsg(e))
    // a GENUINE width-1/depth-1 sketch (degenerate: every key collides
    // into one cell, so every estimate = total row count) must survive
    // the merge — it is a real sketch, not the nothing-merged-yet state
    val merged = df.groupBy("part")
      .agg(approx_topk_state(col("key"), 3, 1, 1).as("st"))
      .agg(approx_topk_merge(col("st"), 3).as("topk"))
      .select(explode(col("topk")).as("e"))
      .select(col("e.key"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(merged.size == 3 && merged.forall(_._2 == 50L),
      s"degenerate-but-real sketches were dropped or mis-merged: $merged")
  }

  test("width decay folds to an exact replay at the target width; memory shrinks 2^g") {
    import org.apache.spark.sql.graft.CmsTopKBuffer
    // the folded counts array must be CELL-FOR-CELL identical to a
    // sketch built directly at the target width over the same adds —
    // the property that makes the CMS guarantee survive decay
    val wide = new CmsTopKBuffer(1024, 5, 10)
    val narrow = new CmsTopKBuffer(256, 5, 10)
    val rnd = new scala.util.Random(42)
    (1 to 20000).foreach { _ =>
      val key = s"k${math.min(rnd.nextInt(400), rnd.nextInt(400))}" // skewed
      wide.add(key); narrow.add(key)
    }
    val folded = wide.foldTo(256)
    assert(java.util.Arrays.equals(folded.counts, narrow.counts),
      "folded cells must equal a direct build at the target width")
    (0 until 400).foreach { i =>
      assert(folded.estimate(s"k$i") == narrow.estimate(s"k$i"), s"k$i")
      assert(folded.estimate(s"k$i") >= wide.estimate(s"k$i"),
        s"decay must only widen the overestimate: k$i")
    }
    // memory shrinks 4x for two generations (the counts array dominates
    // the serialized form — the session-level test below pins the
    // serialized-bytes shrink through the sketch column itself)
    assert(folded.counts.length * 4 == wide.counts.length)
    // non-divisible fold refuses loudly
    val err = intercept[IllegalArgumentException](wide.foldTo(300))
    assert(err.getMessage.contains("must divide"))
  }

  test("decay is target-stated: same-cutoff re-runs are no-ops and the width floor holds") {
    val g = GraftSession(spark)
    import spark.implicits._
    val rows = for {
      day <- 1 to 3
      i <- 1 to 400
    } yield (s"$day/$i", ts(day), s"k${i % 40}")
    val events = rows.toDF("event_id", "ts", "user_key")
    g.createApproxTSTopK("tk_idem", events, "user_key", "ts", "1 day", 5,
      width = 1024)
    try {
      def lens(): Seq[Long] = g.table("tk_idem_sketches")
        .select(length(col("sketch")).cast("long"))
        .collect().map(_.getLong(0)).sorted.toSeq
      def answer(): Seq[(String, Long)] = g.queryApproxTSTopK("tk_idem",
          "2024-01-01 00:00:00", "2024-01-04 00:00:00", 5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      // retention through the SQL face (SQL-only deployments)
      g.sql("ALTER TOPK tk_idem DECAY OLDER THAN '2024-01-03 00:00:00' GENERATIONS 2")
      val after1 = (lens(), answer())
      // the RETRIED retention job: same cutoff, same generations — the
      // absolute target (base 1024 >> 2 = 256) is already reached, so
      // nothing may decay again (the pre-r13 relative form halved twice)
      g.sql("ALTER TOPK tk_idem DECAY OLDER THAN '2024-01-03 00:00:00' GENERATIONS 2")
      assert((lens(), answer()) == after1, "same-cutoff re-run must be a no-op")
      // API face re-run too
      g.decayApproxTSTopK("tk_idem", "2024-01-03 00:00:00", generations = 2)
      assert((lens(), answer()) == after1, "API re-run must be a no-op")
      def agedWidths(): Seq[Int] = g.table("tk_idem_sketches")
        .filter(col("bucket_end") <= lit("2024-01-03 00:00:00").cast("timestamp"))
        .select(col("sketch")).collect()
        .map(r => java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](0)).getInt).toSeq
      // a floor NOT reachable by exact halving stops ABOVE it (the
      // "never below" contract wins over folding depth): from width 256,
      // MIN WIDTH 100 lands on 128 — the halving that would reach 64 is
      // refused because it crosses the floor
      g.sql("ALTER TOPK tk_idem DECAY OLDER THAN '2024-01-03 00:00:00' " +
        "GENERATIONS 30 MIN WIDTH 100")
      assert(agedWidths().nonEmpty && agedWidths().forall(_ == 128),
        s"floor-crossing halving must be refused: ${agedWidths()}")
      // the floor: an absurd generations count cannot fold below MIN
      // WIDTH — estimates degrade no further than the stated bound
      // (35 > 31 also exercises the int-shift clamp: >>35 would WRAP to
      // a no-op without it)
      g.sql("ALTER TOPK tk_idem DECAY OLDER THAN '2024-01-03 00:00:00' " +
        "GENERATIONS 35 MIN WIDTH 64")
      val widths = agedWidths()
      assert(widths.nonEmpty && widths.forall(_ == 64),
        s"floored widths expected 64: ${widths.toSeq}")
      // fresh epochs (beyond the cutoff) never moved
      val freshW = g.table("tk_idem_sketches")
        .filter(col("bucket_end") > lit("2024-01-03 00:00:00").cast("timestamp"))
        .select(col("sketch")).collect()
        .map(r => java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](0)).getInt)
      assert(freshW.nonEmpty && freshW.forall(_ == 1024), freshW.toSeq.toString)
    } finally {
      g.dropTable("tk_idem"); g.dropTable("tk_idem_sketches")
    }
  }

  test("decayed aged epochs keep answering range queries (Hokusai time decay)") {
    val g = GraftSession(spark)
    import spark.implicits._
    val rows = for {
      day <- 1 to 4
      (key, n) <- (1 to 5).map(i => (s"a${day}_$i", 100)) :+ (("spread", 60))
      j <- 1 to n
    } yield (s"$day/$key/$j", ts(day), key)
    val events = rows.toDF("event_id", "ts", "user_key")
    g.createApproxTSTopK("tk_dc", events, "user_key", "ts", "1 day", 5,
      width = 2048)
    try {
      val lenByAge = () => g.table("tk_dc_sketches")
        .select((col("bucket_end") <= lit("2024-01-03 00:00:00").cast("timestamp"))
          .as("aged"), length(col("sketch")).cast("long").as("len"))
        .groupBy("aged").agg(max("len").as("len"))
        .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      val before = lenByAge()
      // decay days 1-2 by two generations: 2048 → 512 cells per row
      g.decayApproxTSTopK("tk_dc", "2024-01-03 00:00:00", generations = 2)
      val after = lenByAge()
      assert(after(true) < before(true) / 3,
        s"aged sketches must shrink ~4x: $before → $after")
      assert(after(false) == before(false), "fresh epochs untouched")
      // a range spanning DECAYED day 2 and FRESH day 3 still answers:
      // the merge folds the fresh sketch to the aged width; at this key
      // cardinality 512 cells are still collision-free, so counts stay
      // exact — the spread key surfaces with its exact aggregate count
      val got = g.queryApproxTSTopK("tk_dc",
          "2024-01-02 00:00:00", "2024-01-04 00:00:00", 5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got.head == ("spread", 120L), s"got $got")
      // exact-replay pin: identical to ONE sketch built directly at the
      // FOLDED width over the union of the two epochs' raw rows
      val union = events
        .filter(col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-04 00:00:00").cast("timestamp"))
        .agg(org.apache.spark.sql.graft.CmsTopKAggregate
          .approx_topk(col("user_key"), 5, width = 512).as("topk"))
        .select(posexplode(col("topk")))
        .select(col("col.key"), col("col.count"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == union, s"decayed merge diverged from folded replay:\n$got\n$union")
    } finally {
      g.dropTable("tk_dc"); g.dropTable("tk_dc_sketches")
    }
  }
}
