package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.functions.{col, max => fmax}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** AQP sample-substitution rewrite — the reference's `WITH ERROR` hook
  * (reference: closed-source `sampleSnappyCase`, SnappySessionState.scala:69,
  * SURVEY.md §4 "the one genuinely custom optimizer piece"; SQL contract
  * docs/sde/hac_contracts.md:38-74, Literals.scala:259-303).
  *
  * Contract implemented:
  *  - `SELECT ... WITH ERROR f [CONFIDENCE c] [BEHAVIOR 'b']`:
  *    `UnresolvedRelation(base)` → `UnresolvedRelation(sample)` (the
  *    sample carries `_weight` = inverse inclusion probability) and
  *    inside every Aggregate:
  *      count(*)/count(1) → CAST(round(sum(_weight))) AS BIGINT (HT count)
  *      sum(x)            → sum(x * _weight)                    (HT total)
  *      avg(x)            → sum(x * _weight) / sum(_weight)     (HT mean)
  *  - result functions over an aliased aggregate (hac_contracts.md):
  *      absolute_error(a) — half-width of the c-confidence interval,
  *        from the with-replacement (Hansen-Hurwitz) variance estimator
  *        V̂(T̂) = n·var_samp(w·x); avg uses ratio linearization
  *        V̂(R̂) = n·(s²_wx − 2R̂·s_wx,w + R̂²·s²_w)/ (Σw)²;
  *      relative_error(a) = absolute_error / |estimate|;
  *      lower_bound(a) / upper_bound(a) = estimate ∓ absolute_error.
  *  - BEHAVIOR (error-constraint semantics):
  *      'strict' (default): reject aggregates that cannot be
  *        HT-weighted (min/max/distinct/...), and fail after execution if
  *        any supported aggregate's relative error exceeds `f`;
  *      'run_on_full_table': same detection, but the remedy is to run
  *        the ORIGINAL query on the base table (exact answer);
  *      'local_omit': per-ROW remedy — an aggregate value whose relative
  *        error exceeds `f` is replaced by NULL, the rest of the row
  *        survives (hac_contracts.md "the value is replaced by a special
  *        value like null");
  *      'partial_run_on_base_table': per-GROUP remedy — groups that
  *        exceed the bound are re-computed exactly on the base table and
  *        merged (duplicate-free) with the passing sample-derived groups;
  *      'do_nothing': best effort on the sample, never re-routes.
  *  - base-table re-runs evaluate error functions per the contract:
  *      absolute_error/relative_error → 0, lower/upper_bound → NULL
  *      (hac_contracts.md "Error Functions" notes).
  *  - reserved alias prefix `sample_`: an aggregate aliased `sample_x`
  *    is NOT HT-weighted — it returns the true answer on the sample
  *    table itself (hac_contracts.md "Reserved Keywords").
  *
  * Operating on the UNRESOLVED tree keeps this a pure syntactic rule —
  * name resolution, type coercion and optimization all happen in the
  * stock analyzer afterwards.
  */
object SampleRewrite {

  final case class AqpParams(error: Double, confidence: Double, behavior: String)

  /** Error-estimation strategy (reference `ClosedFormEstimates` /
    * `NumBootStrapTrials` session properties, Literals.scala:259-303).
    * Closed-form is the default: zero extra aggregation state. Bootstrap
    * replaces the normal-theory interval with the percentile interval of
    * `trials` poissonized resamples ([[BootstrapTrials]]) — covers skewed
    * strata where the normal interval under-covers, at 2·trials doubles
    * of aggregation state per group.
    */
  sealed trait ErrorEstimator
  case object ClosedForm extends ErrorEstimator
  final case class Bootstrap(trials: Int, seed: Long) extends ErrorEstimator

  val CLOSED_FORM_KEY = "spark.sql.graft.aqp.closedFormEstimates"
  val TRIALS_KEY = "spark.sql.graft.aqp.numBootstrapTrials"
  val SEED_KEY = "spark.sql.graft.aqp.bootstrapSeed"

  /** The session's configured estimator (defaults: closed-form). */
  def estimatorOf(spark: SparkSession): ErrorEstimator =
    if (spark.conf.get(CLOSED_FORM_KEY, "true").toBoolean) ClosedForm
    else Bootstrap(
      spark.conf.get(TRIALS_KEY, "100").toInt,
      spark.conf.get(SEED_KEY, "2026").toLong)

  /** Aggregates the HT weighting covers. */
  private val supportedAggs = Set("count", "sum", "avg", "mean")
  private val errorFns =
    Set("absolute_error", "relative_error", "lower_bound", "upper_bound")
  /** Aggregate-function names we can recognize syntactically (to detect
    * UNSUPPORTED aggregates pre-resolution).
    */
  private val knownAggs: Set[String] = supportedAggs ++ Set(
    "min", "max", "first", "last", "any_value", "stddev", "stddev_samp",
    "stddev_pop", "variance", "var_samp", "var_pop", "percentile",
    "percentile_approx", "median", "mode", "approx_count_distinct",
    "count_distinct", "collect_list", "collect_set", "corr", "covar_samp",
    "covar_pop", "skewness", "kurtosis", "sum_distinct", "avg_distinct")

  private def weight: Expression = UnresolvedAttribute("_weight")

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args.toSeq, isDistinct = false)

  private def dlit(d: Double): Expression = Literal(d)

  // ---- HT estimators ----
  private def htCountD: Expression = fn("sum", weight)
  private def htSum(x: Expression): Expression = fn("sum", Multiply(x, weight))
  private def htAvg(x: Expression): Expression = Divide(htSum(x), fn("sum", weight))

  private def varS(e: Expression): Expression =
    fn("greatest", dlit(0.0), fn("coalesce", fn("var_samp", e), dlit(0.0)))
  private def covS(a: Expression, b: Expression): Expression =
    fn("coalesce", fn("covar_samp", a, b), dlit(0.0))
  private def nRows: Expression = Cast(fn("count", Literal(1)), DoubleType)

  /** Weighted not-null indicator for count(x). */
  private def wNotNull(arg: Expression): Expression =
    Multiply(weight, Cast(IsNotNull(arg), DoubleType))

  /** Estimate of the aliased aggregate as a DOUBLE expression. */
  private def estimateOf(kind: String, arg: Option[Expression]): Expression =
    kind match {
      case "count" => htCountD
      case "countexpr" => fn("sum", wNotNull(arg.get))
      case "sum" => htSum(arg.get)
      case _ => htAvg(arg.get)
    }

  // ---- bootstrap estimators ([[BootstrapTrials]]/[[BootstrapCI]]) ----

  /** The per-trial resample aggregate for an aliased aggregate kind. Four
    * error functions over one alias build four copies of this expression;
    * the physical planner dedups semantically-equal aggregates, so the
    * trials buffer is computed once per alias.
    */
  private def bootstrapTrialsOf(kind: String, arg: Option[Expression],
      bs: Bootstrap): Expression = {
    val (value, mode) = kind match {
      case "count" => (dlit(1.0), "sum")
      case "countexpr" => (Cast(IsNotNull(arg.get), DoubleType), "sum")
      case "sum" => (arg.get, "sum")
      case _ => (arg.get, "ratio")
    }
    // row identity: xxhash64 over ALL columns — without it, rows sharing
    // (x, w) would share multiplicities, which for count(*) collapses a
    // whole stratum (constant (1, weight)) into ONE Poisson draw per
    // trial and inflates the CI to the stratum total
    val rowKey = fn("xxhash64",
      org.apache.spark.sql.catalyst.analysis.UnresolvedStar(None))
    org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression(
      BootstrapTrials(value, weight, Literal(mode), Literal(bs.trials),
        Literal(bs.seed), rowKey),
      org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
      isDistinct = false)
  }

  /** STRUCT<abs_err, lo, hi> of the percentile CI over the trials. */
  private def bootstrapCiOf(kind: String, arg: Option[Expression],
      confidence: Double, bs: Bootstrap): Expression =
    BootstrapCI(bootstrapTrialsOf(kind, arg, bs), dlit(confidence))

  /** Half-width of the confidence interval (see scaladoc). */
  private def absErrOf(kind: String, arg: Option[Expression], z: Double): Expression =
    kind match {
      case "count" =>
        Multiply(dlit(z), fn("sqrt", Multiply(nRows, varS(weight))))
      case "countexpr" =>
        Multiply(dlit(z), fn("sqrt", Multiply(nRows, varS(wNotNull(arg.get)))))
      case "sum" =>
        Multiply(dlit(z), fn("sqrt", Multiply(nRows, varS(Multiply(arg.get, weight)))))
      case _ =>
        val wx = Multiply(arg.get, weight)
        val r = htAvg(arg.get)
        val vr = fn("greatest", dlit(0.0),
          Add(Subtract(varS(wx), Multiply(Multiply(dlit(2.0), r), covS(wx, weight))),
            Multiply(Multiply(r, r), varS(weight))))
        Divide(Multiply(dlit(z), fn("sqrt", Multiply(nRows, vr))), fn("sum", weight))
    }

  private def isCountStar(args: Seq[Expression]): Boolean =
    args.isEmpty || args == Seq(Literal(1)) || args.exists(_.isInstanceOf[UnresolvedStar])

  /** A SELECT list containing a recognizable aggregate call — covers the
    * no-GROUP-BY case where the parser emits Project, not Aggregate (the
    * analyzer's GlobalAggregates rule hasn't run yet on this tree).
    */
  private def hasAggCall(exprs: Seq[Expression]): Boolean =
    exprs.exists(_.exists {
      case UnresolvedFunction(Seq(n), _, _, _, _, _, _) =>
        knownAggs(n.toLowerCase) || errorFns(n.toLowerCase)
      case _ => false
    })

  /** (alias → (aggKind, arg)) for the supported aliased aggregates of one
    * SELECT list — the targets error functions may reference.
    */
  /** Reserved alias prefix: `sample_x` aggregates return true sample-table
    * answers (never weighted, never error-checked).
    */
  private def isSampleAlias(name: String): Boolean =
    name.toLowerCase.startsWith("sample_")

  private def aliasTargets(exprs: Seq[NamedExpression]): Map[String, (String, Option[Expression])] =
    exprs.collect {
      case Alias(UnresolvedFunction(Seq(n), args, false, _, _, _, _), name)
          if supportedAggs(n.toLowerCase) && !isSampleAlias(name) =>
        val kind = n.toLowerCase match {
          case "count" if isCountStar(args) => "count"
          case "count" => "countexpr" // count(x): weight like sum of (x is not null)
          case k => k
        }
        name.toLowerCase -> (kind, args.headOption)
    }.toMap

  /** Error-expansion context: normal z for closed-form, confidence for
    * the bootstrap percentile interval.
    */
  private final case class EstCtx(z: Double, confidence: Double, est: ErrorEstimator)

  /** abs-err expression under the configured estimator. */
  private def absErrCtx(kind: String, arg: Option[Expression], ctx: EstCtx): Expression =
    ctx.est match {
      case ClosedForm => absErrOf(kind, arg, ctx.z)
      case bs: Bootstrap =>
        GetStructField(bootstrapCiOf(kind, arg, ctx.confidence, bs), 0, Some("abs_err"))
    }

  private def rewriteAgg(e: Expression, targets: Map[String, (String, Option[Expression])],
      ctx: EstCtx): Expression = e match {
    case UnresolvedFunction(Seq(n), args, false, _, _, _, _)
        if n.equalsIgnoreCase("count") && isCountStar(args) =>
      Cast(fn("round", fn("sum", weight)), LongType)
    case UnresolvedFunction(Seq(n), Seq(arg), false, _, _, _, _)
        if n.equalsIgnoreCase("count") =>
      Cast(fn("round", fn("sum", wNotNull(arg))), LongType)
    case UnresolvedFunction(Seq(n), Seq(arg), false, _, _, _, _)
        if n.equalsIgnoreCase("sum") =>
      fn("sum", Multiply(arg, weight))
    case UnresolvedFunction(Seq(n), Seq(arg), false, _, _, _, _)
        if n.equalsIgnoreCase("avg") || n.equalsIgnoreCase("mean") =>
      Divide(fn("sum", Multiply(arg, weight)), fn("sum", weight))
    case UnresolvedFunction(Seq(n), Seq(arg), false, _, _, _, _)
        if errorFns(n.toLowerCase) =>
      val target = arg match {
        case UnresolvedAttribute(parts) => parts.last.toLowerCase
        case Literal(s, _) => String.valueOf(s).toLowerCase
        case other => throw new IllegalArgumentException(
          s"${n.toLowerCase}(...) expects the alias of an aggregate in the same SELECT, got: $other")
      }
      val (kind, kArg) = targets.getOrElse(target,
        throw new IllegalArgumentException(
          s"${n.toLowerCase}($target): no supported aggregate aliased '$target' in this SELECT " +
            s"(error functions apply to count(*)/sum/avg aliases)"))
      val est = estimateOf(kind, kArg)
      val abs = absErrCtx(kind, kArg, ctx)
      (n.toLowerCase, ctx.est) match {
        case ("absolute_error", _) => abs
        case ("relative_error", _) =>
          Divide(abs, fn("nullif", fn("abs", est), dlit(0.0)))
        // bootstrap bounds are the (possibly asymmetric) percentile
        // interval itself — keeping the estimator's skew is the point
        case ("lower_bound", bs: Bootstrap) =>
          GetStructField(bootstrapCiOf(kind, kArg, ctx.confidence, bs), 1, Some("lo"))
        case ("upper_bound", bs: Bootstrap) =>
          GetStructField(bootstrapCiOf(kind, kArg, ctx.confidence, bs), 2, Some("hi"))
        case ("lower_bound", _) => Subtract(est, abs)
        case ("upper_bound", _) => Add(est, abs)
      }
    case other => other.mapChildren(rewriteAgg(_, targets, ctx))
  }

  /** Top-level select-list rewrite honoring the `sample_` reserved alias. */
  private def rewriteNamed(ne: NamedExpression,
      targets: Map[String, (String, Option[Expression])], ctx: EstCtx): NamedExpression =
    ne match {
      case a @ Alias(_, name) if isSampleAlias(name) => a
      case other => rewriteAgg(other, targets, ctx).asInstanceOf[NamedExpression]
    }

  /** Aggregate functions in the plan the HT weighting cannot cover. */
  def unsupportedAggs(plan: LogicalPlan): Seq[String] = {
    val found = scala.collection.mutable.LinkedHashSet.empty[String]
    def scan(exprs: Seq[Expression]): Unit =
      exprs.foreach {
        // `sample_x` aliases are true sample answers — any aggregate is fine
        case Alias(_, name) if isSampleAlias(name) =>
        case e => e.foreach {
          case UnresolvedFunction(Seq(n), _, distinct, _, _, _, _) =>
            val ln = n.toLowerCase
            if ((knownAggs(ln) && !supportedAggs(ln)) || (supportedAggs(ln) && distinct))
              found += (if (distinct) s"$ln(DISTINCT)" else ln)
          case _ =>
        }
      }
    plan.foreach {
      case a: Aggregate => scan(a.aggregateExpressions)
      case p: Project if hasAggCall(p.projectList) => scan(p.projectList)
      case _ =>
    }
    found.toSeq
  }

  /** Rewrite `plan` to run on `sampleTable` wherever `baseTable` appears;
    * HT-weight the aggregates and expand error functions.
    */
  def rewrite(plan: LogicalPlan, baseTable: String, sampleTable: String,
      confidence: Double, estimator: ErrorEstimator = ClosedForm): LogicalPlan = {
    val ctx = EstCtx(graft.operators.Aqp.zScore(confidence), confidence, estimator)
    plan.transformUp {
      case r: UnresolvedRelation
          if r.multipartIdentifier.map(_.toLowerCase) == Seq(baseTable.toLowerCase) =>
        UnresolvedRelation(Seq(sampleTable))
      case a: Aggregate =>
        val targets = aliasTargets(a.aggregateExpressions)
        a.copy(aggregateExpressions =
          a.aggregateExpressions.map(rewriteNamed(_, targets, ctx)))
      case p: Project if hasAggCall(p.projectList) =>
        // global aggregate without GROUP BY: still a Project pre-analysis
        val targets = aliasTargets(p.projectList)
        p.copy(projectList = p.projectList.map(rewriteNamed(_, targets, ctx)))
    }
  }

  /** Rewrite for EXACT base-table execution (BEHAVIOR re-routes): the
    * query text still contains error result functions, which have no
    * meaning on the full table — the contract pins them to
    * absolute/relative_error = 0 and lower/upper_bound = NULL.
    */
  def rewriteForBase(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case UnresolvedFunction(Seq(n), Seq(_), false, _, _, _, _)
          if errorFns(n.toLowerCase) =>
        n.toLowerCase match {
          case "absolute_error" | "relative_error" => dlit(0.0)
          case _ => Literal(null, DoubleType)
        }
    }

  /** Topmost select list (None when the query has no recognizable
    * aggregate select list).
    */
  private def selectList(plan: LogicalPlan): Option[Seq[NamedExpression]] =
    plan.collectFirst {
      case a: Aggregate => a.aggregateExpressions
      case p: Project if hasAggCall(p.projectList) => p.projectList
    }

  /** Output-column merge keys for 'partial_run_on_base_table': each simple
    * GROUP BY attribute resolved through the select list — either a bare
    * attribute of the same name or an alias of one (`l_returnflag AS rf`
    * merges on `rf`). Empty when grouping is absent, computed, or a
    * grouping name never surfaces as an output column (⇒ caller falls
    * back to the all-or-nothing base-table rerun).
    */
  private def mergeKeyNames(plan: LogicalPlan): Seq[String] =
    plan.collectFirst { case a: Aggregate => a } match {
      case Some(a) if a.groupingExpressions.nonEmpty &&
          a.groupingExpressions.forall(_.isInstanceOf[UnresolvedAttribute]) =>
        val resolved = a.groupingExpressions.map { g =>
          val gname = g.asInstanceOf[UnresolvedAttribute].nameParts.last.toLowerCase
          a.aggregateExpressions.collectFirst {
            case u: UnresolvedAttribute if u.nameParts.last.toLowerCase == gname =>
              u.nameParts.last
            case Alias(u: UnresolvedAttribute, aname)
                if u.nameParts.last.toLowerCase == gname => aname
          }
        }
        if (resolved.forall(_.isDefined)) resolved.map(_.get) else Nil
      case _ => Nil
    }

  /** Output column names of the topmost select list; None when any entry
    * is unnamed (e.g. `SELECT *`).
    */
  private def outputNamesOf(plan: LogicalPlan): Option[Seq[String]] =
    selectList(plan).flatMap { es =>
      val names = es.map {
        case Alias(_, n) => Some(n)
        case u: UnresolvedAttribute => Some(u.nameParts.last)
        case _ => None
      }
      if (names.forall(_.isDefined)) Some(names.map(_.get)) else None
    }

  /** `sample_`-aliased output columns of the topmost select list. */
  private def sampleAliasNames(plan: LogicalPlan): Seq[String] =
    selectList(plan).map(_.collect {
      case Alias(_, n) if isSampleAlias(n) => n
    }).getOrElse(Nil)

  /** Relation-substitution only (no aggregate weighting). */
  private def substituteRelation(plan: LogicalPlan, baseTable: String,
      sampleTable: String): LogicalPlan =
    plan.transformUp {
      case r: UnresolvedRelation
          if r.multipartIdentifier.map(_.toLowerCase) == Seq(baseTable.toLowerCase) =>
        UnresolvedRelation(Seq(sampleTable))
    }

  /** The original query's topmost ORDER BY, looking through LIMIT. */
  private def topmostSort(plan: LogicalPlan): Option[Sort] = plan match {
    case s: Sort => Some(s)
    case l: GlobalLimit => topmostSort(l.child)
    case l: LocalLimit => topmostSort(l.child)
    case _ => None
  }

  /** Re-apply the original query's topmost ORDER BY on a merged result —
    * union/join outputs are unordered, which would silently drop the
    * query's ordering contract. No-op when the sort expressions cannot
    * resolve against the merged output (sort key absent from the SELECT
    * list — the merge itself is still correct, just unordered).
    */
  private def reapplySort(classic: org.apache.spark.sql.classic.SparkSession,
      df: DataFrame, parsed: LogicalPlan): DataFrame =
    topmostSort(parsed) match {
      case Some(s) =>
        try Dataset.ofRows(classic, Sort(s.order, s.global, df.queryExecution.analyzed))
        catch { case _: org.apache.spark.sql.AnalysisException => df }
      case None => df
    }

  /** As [[rewrite]], but additionally APPEND hidden `_rel_err_i` columns
    * to the topmost Aggregate — one per supported aliased aggregate — for
    * the post-execution error-bound check. Returns (plan, alias→errCol).
    */
  private def rewriteWithErrCols(plan: LogicalPlan, baseTable: String,
      sampleTable: String, confidence: Double,
      estimator: ErrorEstimator): (LogicalPlan, Seq[(String, String)]) = {
    val ctx = EstCtx(graft.operators.Aqp.zScore(confidence), confidence, estimator)
    // targets come from the ORIGINAL select list (pre-weighting)
    val targets = plan.collectFirst {
      case oa: Aggregate => aliasTargets(oa.aggregateExpressions)
      case op: Project if hasAggCall(op.projectList) => aliasTargets(op.projectList)
    }.getOrElse(Map.empty)
    if (targets.isEmpty)
      return (rewrite(plan, baseTable, sampleTable, confidence, estimator), Nil)
    var errCols = Seq.empty[(String, String)]
    val extra = targets.toSeq.zipWithIndex.map { case ((alias, (kind, arg)), i) =>
      val name = s"_rel_err_$i"
      errCols :+= (alias -> name)
      Alias(Divide(absErrCtx(kind, arg, ctx),
        fn("nullif", fn("abs", estimateOf(kind, arg)), dlit(0.0))), name)()
    }
    var done = false
    val out = rewrite(plan, baseTable, sampleTable, confidence, estimator).transformDown {
      case a: Aggregate if !done =>
        done = true
        a.copy(aggregateExpressions = a.aggregateExpressions ++ extra)
      case p: Project if !done && hasAggCall(p.projectList) =>
        done = true
        p.copy(projectList = p.projectList ++ extra)
    }
    (out, errCols)
  }

  /** Parse `sql` (already stripped of the WITH ERROR suffix), apply the
    * behavior contract, and return the resulting DataFrame.
    */
  def run(spark: SparkSession, sql: String, baseTable: String, sampleTable: String,
      params: AqpParams): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, greatest, lit, when}
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val parsed = classic.sessionState.sqlParser.parsePlan(sql)
    // `sample_x` aliases must return true sample-table answers even when
    // the behavior re-routes the rest of the query to the base table
    // (reserved-alias contract) — compute them on the (unweighted) sample
    // side and join them back over the merge keys.
    def withSampleCols(base: DataFrame): DataFrame = {
      val sampleCols = sampleAliasNames(parsed)
      if (sampleCols.isEmpty) return base
      val keys = mergeKeyNames(parsed)
      val grouping = parsed.collectFirst { case a: Aggregate => a.groupingExpressions }
        .getOrElse(Nil)
      outputNamesOf(parsed) match {
        case Some(names) if keys.nonEmpty || grouping.isEmpty =>
          val sampleSide = Dataset.ofRows(classic,
            substituteRelation(parsed, baseTable, sampleTable))
            .select((keys ++ sampleCols).map(col): _*)
          val joined =
            if (keys.nonEmpty) base.drop(sampleCols: _*).join(sampleSide, keys, "left")
            else base.drop(sampleCols: _*).crossJoin(sampleSide)
          reapplySort(classic, joined.select(names.map(col): _*), parsed)
        case _ => base // unresolvable keys: keep base-table values
      }
    }
    // exact execution on the base table, error functions pinned to 0/NULL
    def exactRun(): DataFrame = withSampleCols(Dataset.ofRows(classic, rewriteForBase(parsed)))
    val bad = unsupportedAggs(parsed)
    val estimator = estimatorOf(spark)
    params.behavior match {
      case "strict" if bad.nonEmpty =>
        throw new IllegalArgumentException(
          s"WITH ERROR BEHAVIOR 'strict': aggregate(s) ${bad.mkString(", ")} cannot be " +
            "estimated from a sample; use BEHAVIOR 'run_on_full_table' or 'do_nothing'")
      case ("run_on_full_table" | "partial_run_on_base_table") if bad.nonEmpty =>
        exactRun()
      case b =>
        lazy val rewritten = Dataset.ofRows(classic,
          rewrite(parsed, baseTable, sampleTable, params.confidence, estimator))
        if (b == "do_nothing") rewritten
        else {
          // enforce the requested error bound on the supported aggregates
          val (checkedPlan, errPairs) =
            rewriteWithErrCols(parsed, baseTable, sampleTable, params.confidence, estimator)
          if (errPairs.isEmpty) rewritten
          else {
            val errCols = errPairs.map(_._2)
            // one execution serves both the bound check and the returned
            // result (the aggregate would otherwise run twice)
            val checked = Dataset.ofRows(classic, checkedPlan).localCheckpoint(true)
            val safe = errCols.map(c => coalesce(col(c), lit(0.0)))
            val worstCol = if (safe.size == 1) safe.head else greatest(safe: _*)
            b match {
              case "local_omit" =>
                // per-row remedy: null out just the offending estimates
                val errOf = errPairs.map { case (a, e) => a.toLowerCase -> e }.toMap
                val out = checked.columns.filterNot(errCols.toSet).map { c =>
                  errOf.get(c.toLowerCase) match {
                    case Some(ec) =>
                      when(coalesce(col(ec), lit(0.0)) <= params.error, col(c)).as(c)
                    case None => col(c)
                  }
                }
                checked.select(out.toSeq: _*)
              case "partial_run_on_base_table" if mergeKeyNames(parsed).nonEmpty =>
                // per-group split needs no global error check — build the
                // merged result lazily in ONE plan: passing sample groups
                // union exact re-runs of the failing groups. When nothing
                // fails, the broadcast key set is empty and AQE's empty-
                // relation propagation prunes the base-table scan. Keys
                // are OUTPUT-column names (grouping names resolved through
                // select-list aliases).
                val keys = mergeKeyNames(parsed)
                val passing =
                  checked.filter(worstCol <= params.error).drop(errCols: _*)
                val failingKeys = checked.filter(worstCol > params.error)
                  .select(keys.map(col): _*).distinct()
                // failing groups are few by construction — broadcast the
                // key set; the exact side shuffles only its scan
                val exactFailing =
                  exactRun().join(broadcast(failingKeys), keys, "left_semi")
                // the union is unordered — restore the query's ORDER BY
                reapplySort(classic, passing.unionByName(exactFailing), parsed)
              case _ =>
                val worstRow = checked.agg(fmax(worstCol)).head()
                val worst = if (worstRow.isNullAt(0)) 0.0 else worstRow.getDouble(0)
                if (worst <= params.error) checked.drop(errCols: _*)
                else b match {
                  // partial_run over a GLOBAL aggregate: all-or-nothing
                  case "run_on_full_table" | "partial_run_on_base_table" => exactRun()
                  case _ => throw new IllegalStateException(
                    f"WITH ERROR BEHAVIOR 'strict': observed relative error $worst%.4f exceeds " +
                      f"the requested bound ${params.error}%.4f at confidence ${params.confidence}%.2f; " +
                      "use a larger sample, a looser bound, or BEHAVIOR 'run_on_full_table'")
                }
            }
          }
        }
    }
  }

  /** Back-compat entry (defaults: 95% confidence, best-effort). */
  def run(spark: SparkSession, sql: String, baseTable: String, sampleTable: String): DataFrame =
    run(spark, sql, baseTable, sampleTable, AqpParams(1.0, 0.95, "do_nothing"))
}
