package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window, WindowGroupLimit}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Adjudicator for UNKEYED (single-partition) window operators.
  *
  * The pack's scale discipline allows a global `Window` ONLY over a
  * frame already reduced far below corpus size (a distinct-value
  * histogram, a vocab/threshold table, a top-k result) — over anything
  * data-scale it is the one operator shape that serializes the whole
  * input through one task. PlanSpec gates the named families, but the
  * `WindowExec: No Partition Defined` WARNs in a bench run were never
  * individually adjudicated, so a NEW operator breaking the discipline
  * would scroll by invisibly. This object makes the invariant total:
  *
  *  - [[whitelist]] names every query whose plan is ALLOWED a global
  *    window, with the bounded frame that justifies it;
  *  - [[countLogical]] counts global windows in a query's optimized
  *    logical plan (subqueries included) — the total per-query gate
  *    GlobalWindowSpec runs over the whole pack;
  *  - [[countExecuted]] walks a physical plan (through AQE wrappers,
  *    query stages and cached relations) — `graft.Bench` runs it per
  *    query and emits the census + any violations alongside the
  *    timings, so the adjudication rides every driver bench run.
  */
object GlobalWindows {

  /** query name → the BOUNDED reduced frame its global window runs
    * over (the justification; "bounded" = cardinality is a function of
    * a config/domain constant, never of corpus rows). */
  val whitelist: Map[String, String] = Map(
    "c5_pr_curve" ->
      ("per-threshold (n, tp) frame — margins floor to `granularity` " +
        "buckets BEFORE the cumulative window, so |frame| is bounded " +
        "by the margin domain / granularity, never by documents"),
    "t12_sequence_pack" ->
      ("phase-2 of the two-phase prefix sum (Packing.packChunks): the " +
        "exclusive window orders PER-BUCKET SUBTOTALS — " +
        "|corpus|/bucketWidth (4096×-reduced) skinny rows; per-doc " +
        "cumsums run keyed by bucket"),
    "t22_budget_prune" ->
      ("same two-phase shape over SCORE-BAND subtotals " +
        "(Packing.budgetPrune) — |frame| = score domain / scoreBand, " +
        "a config constant"),
    "t42_packing_sweep" ->
      ("4 sweep points × packChunks phase-2 — each the t12 " +
        "bucket-subtotal window (4 windows total)"),
    "t37_vocab_coverage" ->
      ("cumulative-coverage window over the VOCAB rank frame " +
        "(distinct tokens after the one corpus-scale agg)"),
    "s25_ndcg_audit" ->
      ("rank windows over two top-10 result sets (exact and IVF " +
        "top-k — ≤10 rows each) plus their joined gain frame")
  )

  /** Queries whose global window lives in an INTERNAL driver action
    * (a bounded-collect during query construction), invisible to the
    * final lineage [[countLogical]] gates but caught by Bench's
    * runtime executed-plan census. Same bounded-frame bar as
    * [[whitelist]]; kept separate so the logical spec's exactness
    * check (whitelist rows must still plan a global window) stays
    * meaningful. */
  val internalActionSites: Map[String, String] = Map(
    "t43_curriculum_plan" ->
      ("Splits.scoreBucketThresholds: cumulative histogram over the " +
        "DISTINCT-SCORE frame (bounded ≤ MaxScoreDomain, guarded " +
        "collect) — runs as a driver action while the plan is built"),
    "t45_psi_quality_drift" ->
      "same scoreBucketThresholds site (shared threshold derivation)"
  )

  /** The bench-run gate: a census entry is adjudicated if the query is
    * on either list. Note the two censuses measure different things:
    * the LOGICAL census is total over the declared plan; the RUNTIME
    * census sees only windows that survive the bench action's column
    * pruning (`count()` drops a Window whose outputs feed no filter),
    * plus internal driver actions the lineage can't show. Both gates
    * run; a site must clear whichever census catches it. */
  def runtimeWhitelisted(name: String): Boolean =
    whitelist.contains(name) || internalActionSites.contains(name)

  /** Global windows in the OPTIMIZED LOGICAL plan (subqueries
    * included): `Window`/`WindowGroupLimit` nodes with an empty
    * partitionSpec. */
  def countLogical(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collectWithSubqueries {
      case w: Window if w.partitionSpec.isEmpty => 1
      case w: WindowGroupLimit if w.partitionSpec.isEmpty => 1
    }.sum

  /** Global windows in an EXECUTED physical plan, walking through the
    * adaptive wrapper, materialized query stages, cached relations and
    * subqueries — the census `graft.Bench` attributes per query. */
  def countExecuted(plan: SparkPlan): Int = {
    def kids(n: SparkPlan): Seq[SparkPlan] = (n match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case i: InMemoryTableScanExec => Seq(i.relation.cachedPlan)
      case o => o.children
    }) ++ n.subqueries
    def walk(n: SparkPlan): Int = {
      val self = n match {
        case w: WindowExec if w.partitionSpec.isEmpty => 1
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => 1
        case _ => 0
      }
      self + kids(n).map(walk).sum
    }
    walk(plan)
  }
}
