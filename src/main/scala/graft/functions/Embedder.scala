package graft.functions

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Element

/**
 * Embedding encoder surface (SURVEY §2.11,
 * `/root/reference/unstructured/embed/interfaces.py:14-39`): `embed_documents`
 * fills the `embeddings` column, `embed_query` embeds one string. Providers in the
 * reference are remote APIs/models; the deterministic local encoder here is the
 * offline stand-in (same role as the reference's test encoders) — a keyed-hash
 * random projection: dim `i` of the vector is a pseudo-random value in [-1, 1]
 * derived from `polyHash` of the text under hash function `i`, L2-normalized.
 * Real model providers plug in behind the same `mapPartitions`-batched shape.
 */
object Embedder {

  val DefaultDim = 16

  /** The embedding vector as a column expression (codegen'd, no UDF). */
  def embedColumn(text: Column, dim: Int = DefaultDim): Column = {
    val h = TextAnalysis.polyHash(text)
    val raw = transform(sequence(lit(0L), lit(dim - 1L)),
      i => ((h * (i * 2L + 1L) + i * 7919L) % TextAnalysis.HashMod)
        .cast("double") / lit(TextAnalysis.HashMod.toDouble) * 2.0 - 1.0)
    val norm = sqrt(aggregate(raw, lit(0.0), (acc, v) => acc + v * v))
    transform(when(norm > 0, transform(raw, v => v / norm)).otherwise(raw),
      v => v.cast("float"))
  }

  /** `embed_documents` — fill `.embeddings` for every element. */
  def embedDocuments(ds: Dataset[Element], dim: Int = DefaultDim): Dataset[Element] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.withColumn("embeddings", embedColumn(col("text"), dim)).as[Element]
  }

  /** `embed_query` — one query string to a vector (driver-side). */
  def embedQuery(spark: org.apache.spark.sql.SparkSession, query: String,
      dim: Int = DefaultDim): Array[Float] = {
    import spark.implicits._
    Seq(query).toDF("text").select(embedColumn(col("text"), dim).as("v"))
      .collect()(0).getSeq[Float](0).toArray
  }
}
