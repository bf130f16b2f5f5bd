package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, Expression, PredicateHelper, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import _root_.graft.model.Element
import _root_.graft.operators.{Chunker, ChunkingOptions}

/**
 * Plan-visible chunking (SURVEY §7.3 / §4.2): a first-class logical node +
 * strategy so `chunk_elements` shows up in `explain()` as
 * `GraftChunkElements` instead of an opaque typed `flatMapGroups` chain,
 * plus the one doc-level filter rewrite Catalyst cannot do on its own.
 *
 * The physical operator declares `ClusteredDistribution(doc_id)` +
 * per-partition `(doc_id, seq)` ordering, so Spark plans exactly one hash
 * exchange and one sort — the same shape as the `groupByKey
 * .flatMapSortedGroups` formulation — and the per-document fold streams
 * consecutive groups with O(window) state.
 *
 * Lives under `org.apache.spark.sql` because strategy/exec extension points
 * are `sql`-private in Spark 4 — the standard escape hatch for libraries
 * contributing physical operators.
 */
case class ChunkElementsNode(child: LogicalPlan, opts: ChunkingOptions,
    output: Seq[Attribute]) extends UnaryNode {
  // output attrs are generated ONCE at construction (facade) and carried as a
  // field so expression ids stay stable across optimizer copies; declaring
  // them produced-here makes the node an optimizer boundary — Catalyst cannot
  // push projects/filters through an operator that consumes whole documents
  // (only the doc-level rule below knows which predicates commute)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    outputSet
  // the fold consumes EVERY column of every element of a document — without
  // this, ColumnPruning sees zero expression references and strips the child
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override def nodeName: String = "GraftChunkElements"
  override protected def withNewChildInternal(newChild: LogicalPlan): ChunkElementsNode =
    copy(child = newChild)
}

case class ChunkElementsExec(child: SparkPlan, opts: ChunkingOptions,
    output: Seq[Attribute]) extends UnaryExecNode {

  override def nodeName: String = "GraftChunkElements"

  private def attr(name: String): Attribute =
    child.output.find(_.name == name).getOrElse(
      throw new IllegalStateException(s"chunk input lacks column $name"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(attr("doc_id") :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(attr("doc_id"), Ascending), SortOrder(attr("seq"), Ascending)))

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val chunkOpts = opts
    // resolved on the driver; Serializer/Deserializer are the same
    // serializable projections Dataset.rdd ships to executors
    val resolved = ExpressionEncoder[Element]().resolveAndBind(childOutput)
    val fromRow = resolved.createDeserializer()
    val toRow = resolved.createSerializer()
    child.execute().mapPartitions { rows =>
      val elements = rows.map(r => fromRow(r))
      // consecutive grouping: child is hash-distributed and sorted by doc_id
      new Iterator[InternalRow] {
        private var head: Option[Element] =
          if (elements.hasNext) Some(elements.next()) else None
        private var current: Iterator[Element] = Iterator.empty
        private def nextGroup(): Unit = head match {
          case None => ()
          case Some(first) =>
            val doc = first.doc_id
            val buf = Vector.newBuilder[Element]
            buf += first
            head = None
            var continue = true
            while (continue && elements.hasNext) {
              val e = elements.next()
              if (e.doc_id == doc) buf += e
              else { head = Some(e); continue = false }
            }
            current = Chunker.chunkDoc(doc, buf.result().iterator, chunkOpts)
        }
        override def hasNext: Boolean = {
          while (!current.hasNext && head.isDefined) nextGroup()
          current.hasNext
        }
        override def next(): InternalRow = toRow(current.next())
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): ChunkElementsExec =
    copy(child = newChild)
}

/** Plans [[ChunkElementsNode]] into [[ChunkElementsExec]]. */
object ChunkStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case ChunkElementsNode(child, opts, out) =>
      ChunkElementsExec(planLater(child), opts, out) :: Nil
    case _ => Nil
  }
}

/**
 * The SURVEY §4.2 "safe and valuable" doc-level rewrite: a filter on
 * `doc_id` above chunking commutes with it (chunking is a pure per-document
 * fold), so push it below the node and skip chunking filtered-out documents
 * entirely. Filters on any other column (text, type, metadata) must stay
 * above — the chunker consumes every element of a document.
 */
object PushDocFilterThroughChunk extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, c @ ChunkElementsNode(child, _, _)) =>
      val (push0, keep) = splitConjunctivePredicates(cond).partition { p =>
        val refs = p.references.toSeq
        refs.nonEmpty && refs.forall(_.name == "doc_id") && p.deterministic
      }
      child.output.find(_.name == "doc_id") match {
        case Some(childDocId) if push0.nonEmpty =>
          // the node produces its own attribute ids — remap the pushed
          // predicate onto the child's doc_id attribute
          val push = push0.map(_.transform {
            case a: org.apache.spark.sql.catalyst.expressions.Attribute
              if a.name == "doc_id" => childDocId
          })
          val below = c.withNewChildren(
            Seq(Filter(push.reduce(And), child))).asInstanceOf[ChunkElementsNode]
          keep.reduceOption[Expression](And(_, _)).map(Filter(_, below)).getOrElse(below)
        case _ => f
      }
  }
}

/** Facade + session wiring for the plan-visible chunker. */
object ChunkPlan {

  /** Idempotently register the strategy + rule on an existing session
    * (`spark.experimental` is the runtime extension point; `GraftExtensions`
    * serves `spark.sql.extensions` users). */
  def register(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(ChunkStrategy))
      exp.extraStrategies = exp.extraStrategies :+ ChunkStrategy
    if (!exp.extraOptimizations.exists(_ eq PushDocFilterThroughChunk))
      exp.extraOptimizations = exp.extraOptimizations :+ PushDocFilterThroughChunk
  }

  /** `chunk_elements`/`chunk_by_title` as a first-class plan node. Column
    * order normalizes to the Element encoder schema so the physical
    * serializer and the node output line up. */
  def chunkElements(ds: Dataset[Element], opts: ChunkingOptions): Dataset[Element] = {
    val spark = ds.sparkSession
    register(spark)
    import org.apache.spark.sql.functions.col
    val enc = ExpressionEncoder[Element]()
    val cols: Seq[Column] = enc.schema.fieldNames.toSeq.map(col)
    val normalized = ds.toDF().select(cols: _*)
    val output = org.apache.spark.sql.catalyst.types.DataTypeUtils
      .toAttributes(enc.schema)
    val node = ChunkElementsNode(normalized.queryExecution.analyzed, opts, output)
    import ds.sparkSession.implicits._
    org.apache.spark.sql.classic.Dataset
      .ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], node)
      .as[Element]
  }
}

/** `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions` wiring
  * for cluster deployments where the session is built by the platform. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => ChunkStrategy)
    ext.injectOptimizerRule(_ => PushDocFilterThroughChunk)
    ext.injectPlannerStrategy(_ => PartitionStrategy)
    ext.injectOptimizerRule(_ => PushDocFilterThroughPartition)
  }
}
