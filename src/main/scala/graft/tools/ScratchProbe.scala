package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway perf probe (not part of the library surface).
  *
  * Current target: attribute the `q_scalar_functions` r5 regression
  * (0.23 s → 1.51 s, stable across runs — VERDICT r5 "What's wrong #2").
  * Arms decompose the query: full body, plan-only, dround-free,
  * column-subset halves, plus `q_dedup_exact` (the other flagged query).
  * Arms are INTERLEAVED per round (host noise phases — see PERF_NOTES §1);
  * per-arm minima across rounds are the comparable statistic.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.graft", "org.apache.spark.sql.graft.store.GraftCatalog")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def scalarBase(): DataFrame = Tables.load(spark, dir, "lineitem")
      .filter(col("l_orderkey") <= 100)

    def fullSelect(df: DataFrame): DataFrame = df.select(
      col("l_orderkey"), col("l_linenumber"),
      upper(col("l_returnflag")).as("flag_upper"),
      concat_ws("-", col("l_returnflag"), col("l_linestatus")).as("flag_concat"),
      length(concat(col("l_returnflag"), col("l_linestatus"))).as("flag_len"),
      lpad(col("l_linenumber").cast("string"), 3, "0").as("line_pad"),
      substring(concat(col("l_returnflag"), col("l_linestatus")), 1, 1).as("flag_sub"),
      abs(col("l_quantity") - 25).cast("double").as("qty_center"),
      ceil(col("l_extendedprice") / 1000).cast("bigint").as("price_k"),
      graft.dround(sqrt(col("l_quantity")), 4).as("qty_sqrt"),
      graft.dround(log(col("l_extendedprice")), 4).as("price_ln"),
      (col("l_quantity").cast("bigint") % 7).as("qty_mod"),
      year(col("l_shipdate")).cast("int").as("ship_year"),
      month(col("l_shipdate")).cast("int").as("ship_month"),
      when(col("l_discount") > 0.05, "high").otherwise("low").as("disc_band"),
      coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_or_none"),
      greatest(col("l_tax"), col("l_discount")).as("max_rate"))

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def arm(name: String)(f: => Unit): (String, () => Double) =
      (name, () => { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 })

    val arms = Seq(
      arm("full query (as benched)") {
        noop(fullSelect(scalarBase()).orderBy(col("l_orderkey"), col("l_linenumber")))
      },
      arm("plan only (executedPlan forced)") {
        fullSelect(scalarBase()).orderBy(col("l_orderkey"), col("l_linenumber"))
          .queryExecution.executedPlan
      },
      arm("no orderBy") {
        noop(fullSelect(scalarBase()))
      },
      arm("no dround cols") {
        noop(scalarBase().select(
          col("l_orderkey"), col("l_linenumber"),
          upper(col("l_returnflag")).as("flag_upper"),
          concat_ws("-", col("l_returnflag"), col("l_linestatus")).as("flag_concat"),
          length(concat(col("l_returnflag"), col("l_linestatus"))).as("flag_len"),
          lpad(col("l_linenumber").cast("string"), 3, "0").as("line_pad"),
          substring(concat(col("l_returnflag"), col("l_linestatus")), 1, 1).as("flag_sub"),
          abs(col("l_quantity") - 25).cast("double").as("qty_center"),
          ceil(col("l_extendedprice") / 1000).cast("bigint").as("price_k"),
          (col("l_quantity").cast("bigint") % 7).as("qty_mod"),
          year(col("l_shipdate")).cast("int").as("ship_year"),
          month(col("l_shipdate")).cast("int").as("ship_month"),
          when(col("l_discount") > 0.05, "high").otherwise("low").as("disc_band"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_or_none"),
          greatest(col("l_tax"), col("l_discount")).as("max_rate"))
          .orderBy(col("l_orderkey"), col("l_linenumber")))
      },
      arm("keys+dround only") {
        noop(scalarBase().select(
          col("l_orderkey"), col("l_linenumber"),
          graft.dround(sqrt(col("l_quantity")), 4).as("qty_sqrt"),
          graft.dround(log(col("l_extendedprice")), 4).as("price_ln"))
          .orderBy(col("l_orderkey"), col("l_linenumber")))
      },
      arm("scan+filter only") {
        noop(scalarBase().select(col("l_orderkey"), col("l_linenumber")))
      },
      arm("q_dedup_exact (as benched)") {
        noop(graft.SparkEntry.queries("q_dedup_exact")(spark, dir))
      },
      arm("q_scalar_functions2 (sibling)") {
        noop(graft.SparkEntry.queries("q_scalar_functions2")(spark, dir))
      }
    )

    // warmup every arm once, then interleave rounds
    arms.foreach { case (_, f) => f() }
    val rounds = 4
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    (1 to rounds).foreach { _ =>
      arms.foreach { case (n, f) =>
        acc(n) = f() :: acc.getOrElse(n, Nil)
      }
    }
    println("== ScratchProbe: q_scalar_functions decomposition (sf0.1) ==")
    arms.foreach { case (n, _) =>
      val ts = acc(n)
      println(f"$n%-36s min=${ts.min}%.3f  all=${ts.reverse.map(t => f"$t%.3f").mkString(",")}")
    }
  }
}
