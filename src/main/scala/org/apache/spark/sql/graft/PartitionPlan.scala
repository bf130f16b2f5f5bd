package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import _root_.graft.functions.expr.DetectMime
import _root_.graft.sources.AutoSource
import _root_.graft.sources.AutoSource.RawPartitionRow

/**
 * Plan-visible `partition()` (SURVEY §4.2's second custom-Rule opportunity):
 * the auto-router parse as a first-class logical node, plus the doc-level
 * filter rewrite Catalyst cannot derive on its own.
 *
 * Why a node instead of the typed `flatMap` in [[AutoSource.partitionFiles]]:
 * a filter on `doc_id` (the file path) or `filetype` (the detected MIME)
 * written ABOVE the parse is, to Catalyst, an opaque predicate over generated
 * columns — it runs after every document has already been parsed. Both are in
 * fact pure functions of the INPUT row: `doc_id = path`, and
 * `filetype = detect_filetype(path, content).mime_type` (a bounded head
 * sniff). [[PushDocFilterThroughPartition]] rewrites such predicates onto the
 * child — `doc_id` onto the scan's `path` column (from where Catalyst keeps
 * pushing it into the file-source scan), `filetype` onto a [[DetectMime]]
 * head-sniff — so excluded documents are never parsed at all. At 100 TB the
 * parse dominates the scan by orders of magnitude; "filter by filetype, then
 * partition" must not cost a full-corpus parse.
 *
 * Parse stays embarrassingly parallel: the exec declares no required
 * distribution and preserves child partitioning — no shuffle is introduced.
 */
case class PartitionDocsNode(child: LogicalPlan, processAttachments: Boolean,
    output: Seq[Attribute]) extends UnaryNode {
  // produced-here output + full child consumption: same optimizer-boundary
  // contract as ChunkElementsNode (only the rule below knows what commutes)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    outputSet
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override def nodeName: String = "GraftPartitionDocs"
  override protected def withNewChildInternal(newChild: LogicalPlan): PartitionDocsNode =
    copy(child = newChild)
}

case class PartitionDocsExec(child: SparkPlan, processAttachments: Boolean,
    output: Seq[Attribute]) extends UnaryExecNode {

  override def nodeName: String = "GraftPartitionDocs"

  // per-file parse: no distribution requirement, child partitioning flows through
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val pathOrd = childOutput.indexWhere(_.name == "path")
    val contentOrd = childOutput.indexWhere(_.name == "content")
    require(pathOrd >= 0 && contentOrd >= 0,
      "partition input needs `path` string and `content` binary columns")
    val attach = processAttachments
    val rowEnc = ExpressionEncoder[RawPartitionRow]()
    child.execute().mapPartitions { rows =>
      val toRow = rowEnc.createSerializer()
      rows.flatMap { r =>
        val path = r.getUTF8String(pathOrd).toString
        val content = r.getBinary(contentOrd)
        AutoSource.parseDoc(path, content, attach).iterator.map(toRow(_))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): PartitionDocsExec =
    copy(child = newChild)
}

/** Plans [[PartitionDocsNode]] into [[PartitionDocsExec]]. */
object PartitionStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PartitionDocsNode(child, attach, out) =>
      PartitionDocsExec(planLater(child), attach, out) :: Nil
    case _ => Nil
  }
}

/**
 * Push doc-level predicates below the parse. A conjunct commutes when it is
 * deterministic and references only `doc_id` and/or `filetype`: every output
 * row of one input document carries the same value for both, and both are
 * functions of the input row alone. Pushed conjuncts are REMOVED from above
 * (the rewrite is exact, not merely implied). Disabled under
 * `processAttachments` — there one input row fans out to doc_ids
 * (`path`, `path!attachment`) and per-attachment filetypes, so neither
 * equality holds.
 */
object PushDocFilterThroughPartition extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, p @ PartitionDocsNode(child, false, _)) =>
      val (push0, keep) = splitConjunctivePredicates(cond).partition { pr =>
        val names = pr.references.toSeq.map(_.name)
        names.nonEmpty && pr.deterministic &&
          names.forall(n => n == "doc_id" || n == "filetype")
      }
      (child.output.find(_.name == "path"), child.output.find(_.name == "content")) match {
        case (Some(path), Some(content)) if push0.nonEmpty =>
          val push = push0.map(_.transform {
            case a: Attribute if a.name == "doc_id" => path
            case a: Attribute if a.name == "filetype" => DetectMime(path, content)
          })
          val below = p.withNewChildren(
            Seq(Filter(push.reduce(And), child))).asInstanceOf[PartitionDocsNode]
          keep.reduceOption[Expression](And(_, _)).map(Filter(_, below)).getOrElse(below)
        case _ => f
      }
  }
}

/** Facade + session wiring for the plan-visible auto-router. */
object PartitionPlan {

  /** Idempotently register strategy + rule (runtime extension point; the
    * `GraftExtensions` class serves `spark.sql.extensions` users). */
  def register(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(PartitionStrategy))
      exp.extraStrategies = exp.extraStrategies :+ PartitionStrategy
    if (!exp.extraOptimizations.exists(_ eq PushDocFilterThroughPartition))
      exp.extraOptimizations = exp.extraOptimizations :+ PushDocFilterThroughPartition
    // the user-rule batch runs AFTER the main optimizer, to its own fixed
    // point — re-listing Catalyst's predicate pushdown there lets a filter our
    // rules emit keep sinking through the projections/windows between the
    // chunk fold, the parse, and the scan
    if (!exp.extraOptimizations.exists(
        _ eq org.apache.spark.sql.catalyst.optimizer.PushDownPredicates))
      exp.extraOptimizations = exp.extraOptimizations :+
        org.apache.spark.sql.catalyst.optimizer.PushDownPredicates
  }

  /** `partition()` over any `(path string, content binary)` DataFrame as a
    * first-class plan node, with the same classifier cascade + resequence the
    * typed [[AutoSource.partitionFiles]] applies. */
  def partitionDocs(docs: DataFrame, processAttachments: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    register(spark)
    import org.apache.spark.sql.functions.col
    val normalized = docs.select(col("path").cast("string").as("path"), col("content"))
    val output = org.apache.spark.sql.catalyst.types.DataTypeUtils
      .toAttributes(ExpressionEncoder[RawPartitionRow]().schema)
    val node = PartitionDocsNode(
      normalized.queryExecution.analyzed, processAttachments, output)
    val raw = org.apache.spark.sql.classic.Dataset
      .ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], node)
    AutoSource.typedFromRaw(raw)
  }

  /** [[partitionDocs]] over a `binaryFile` scan of `pathGlob`, fanned out
    * past Spark's byte-based split packing when that would serialize the
    * parse ([[AutoSource.fanoutFiles]]). */
  def partitionFiles(spark: SparkSession, pathGlob: String,
      processAttachments: Boolean = false): DataFrame =
    partitionDocs(
      AutoSource.fanoutFiles(
        spark.read.format("binaryFile").load(pathGlob)
          .selectExpr("path", "content")),
      processAttachments)

  /** Lift the router's element rows into the typed [[Element]] model as a pure
    * projection (every unset metadata field a typed null) — declarative on
    * purpose, so predicates keep commuting down the composed plan; a typed
    * `map` here would wall off the pushdown rules below it. */
  def toElements(parsed: DataFrame): org.apache.spark.sql.Dataset[_root_.graft.model.Element] = {
    import org.apache.spark.sql.functions.{col, lit, struct}
    import org.apache.spark.sql.types.StructType
    val enc = ExpressionEncoder[_root_.graft.model.Element]()
    val metaType = enc.schema("metadata").dataType.asInstanceOf[StructType]
    val provided: Map[String, org.apache.spark.sql.Column] = Map(
      "filetype" -> col("filetype"),
      "category_depth" -> col("category_depth"),
      "text_as_html" -> col("text_as_html"),
      "page_number" -> col("page_number"),
      "page_name" -> col("page_name"),
      "attached_to_filename" -> col("attached_to_filename"))
    val meta = struct(metaType.fields.toSeq.map { f =>
      provided.get(f.name).map(_.cast(f.dataType))
        .getOrElse(lit(null).cast(f.dataType)).as(f.name)
    }: _*)
    parsed.select(
      lit("").as("element_id"),
      col("element_type").as("type"),
      col("text"),
      col("doc_id"),
      col("seq"),
      meta.as("metadata"),
      lit(null).cast(enc.schema("embeddings").dataType).as("embeddings"))
      .as(enc)
  }

  /**
   * The reference's one-call `partition(..., chunking_strategy=...)` pipeline
   * (`chunking/dispatch.py:84-115` via `partition/auto.py`): detect + parse +
   * chunk as ONE composed plan. Both stages are named nodes, so `explain()`
   * shows `GraftChunkElements` over `GraftPartitionDocs`, and a `doc_id`
   * filter written above the chunker pushes through BOTH — below the chunk
   * fold, through the lift/resequence projections, below the parse, and into
   * the file scan. Custom strategies registered via
   * `Registries.registerChunkingStrategy` dispatch like the reference's.
   */
  def partitionAndChunk(docs: DataFrame, chunkingStrategy: String = "basic",
      chunkOpts: _root_.graft.operators.ChunkingOptions =
        _root_.graft.operators.ChunkingOptions(),
      processAttachments: Boolean = false)
      : org.apache.spark.sql.Dataset[_root_.graft.model.Element] = {
    val els = toElements(partitionDocs(docs, processAttachments))
    chunkingStrategy match {
      case "basic" => ChunkPlan.chunkElements(els, chunkOpts.copy(byTitle = false))
      case "by_title" => ChunkPlan.chunkElements(els, chunkOpts.copy(byTitle = true))
      case other => _root_.graft.operators.Registries.chunk(els, other, chunkOpts)
    }
  }
}
