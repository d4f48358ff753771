package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** windowFunnel combinator (SURVEY §2.4 / §2.10): greedy
  * earliest-chain funnel levels with an aggregation buffer that is
  * JUST the chain-so-far struct — O(steps) state per user, however
  * many events the user has. The reference engine ships windowFunnel
  * as a native aggregate combinator over time-sorted event state
  * (clickhouse windowFunnel lineage, SURVEY §2's events family); the
  * prior Spark shape here (`collect_list` + `sort_array` + the
  * `aggregate` HOF) had the right single-pass plan but materialized
  * O(events-per-user) state inside the aggregation buffer — a
  * pathological bot user with tens of millions of events would
  * pressure one task. This expression removes that bound.
  *
  * ORDERING CONTRACT: update() folds events in the order rows reach
  * the aggregate, so the input MUST be clustered by the group key and
  * sorted by event time within partitions
  * (`repartition(user).sortWithinPartitions(user, us)` — see
  * [[graft.operators.EventsAnalytics.funnel]]). The buffer is a
  * single struct-typed attribute ON PURPOSE: struct buffers are not
  * supported by `HashAggregateExec` (mutable fixed-width types only)
  * and this is not a `TypedImperativeAggregate` (so
  * `ObjectHashAggregateExec` is out) — the planner is therefore
  * forced to pick `SortAggregateExec`, the one aggregate that
  * consumes rows strictly in child sort order and never re-buffers or
  * spills them through an order-breaking hash map fallback. A
  * TypedImperativeAggregate would NOT be sound here: ObjectHashAgg's
  * 128-key sort-based fallback re-sorts remaining input rows by group
  * key alone, and tie order across spill files is unspecified — the
  * very 1M-event-user case this buffer exists for is the case that
  * would break it.
  *
  * Greedy fold semantics (identical to the HOF it replaces): t1 =
  * first steps(0) event; step i fires on the first steps(i) event
  * STRICTLY after t(i-1) and at most `windowUs` after t1. Equal-time
  * candidates produce the identical min, so sorting by time alone is
  * deterministic.
  *
  * Merge safety: a group never spans partitions (input is
  * pre-partitioned by the group key), so the final aggregate only
  * ever merges one real partial buffer into the empty initial buffer.
  * Merging two non-empty partials cannot be done exactly with
  * O(steps) state, so that case raises an error loudly instead of
  * returning a silently-wrong chain.
  */
case class WindowFunnelChain(
    us: Expression,
    eventType: Expression,
    steps: Seq[String],
    windowUs: Long) extends DeclarativeAggregate {

  require(steps.nonEmpty, "windowFunnel needs at least one step")
  require(steps.distinct.size == steps.size,
    "windowFunnel steps must be distinct")

  override def children: Seq[Expression] = Seq(us, eventType)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_window_funnel"

  private val fieldNames = steps.indices.map(i => s"t${i + 1}_us")
  private val chainType = StructType(
    fieldNames.map(f => StructField(f, LongType, nullable = true)))
  override def dataType: DataType = chainType

  override def checkInputDataTypes(): TypeCheckResult =
    if (us.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs BIGINT event times, got ${us.dataType.sql}")
    else if (eventType.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs STRING event types, got ${eventType.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val chain =
    AttributeReference("chain", chainType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(chain)

  private def emptyChain: Expression = CreateNamedStruct(
    fieldNames.flatMap(f =>
      Seq(Literal(f), Literal.create(null, LongType))))

  override lazy val initialValues: Seq[Expression] = Seq(emptyChain)

  /** One fold step: each field keeps its value unless this event is
    * the first chainable hit for that step (strictly after the
    * previous step's time, within windowUs of t1). All fields read
    * the PRE-update buffer, so one event can never fire two steps. */
  override lazy val updateExpressions: Seq[Expression] = {
    def f(i: Int): Expression = GetStructField(chain, i, Some(fieldNames(i)))
    val cap = Add(f(0), Literal(windowUs))
    val updated = CreateNamedStruct(fieldNames.zipWithIndex.flatMap {
      case (name, i) =>
        val hit =
          if (i == 0) And(IsNull(f(0)), EqualTo(eventType, Literal(steps(0))))
          else And(And(IsNull(f(i)), IsNotNull(f(i - 1))),
            And(EqualTo(eventType, Literal(steps(i))),
              And(GreaterThan(us, f(i - 1)), LessThanOrEqual(us, cap))))
        Seq(Literal(name), If(hit, us, f(i)))
    })
    Seq(updated)
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    def t1Of(c: Expression): Expression =
      GetStructField(c, 0, Some(fieldNames.head))
    Seq(
      If(IsNull(t1Of(chain.left)), chain.right,
        If(IsNull(t1Of(chain.right)), chain.left,
          Cast(new RaiseError(Literal(
            "graft_window_funnel merged two non-empty partial buffers: " +
              "input must be pre-partitioned by the group key")), chainType))))
  }

  override lazy val evaluateExpression: Expression = chain

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WindowFunnelChain =
    copy(us = newChildren(0), eventType = newChildren(1))
}
