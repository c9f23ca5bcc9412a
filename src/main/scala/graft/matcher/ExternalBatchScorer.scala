package graft.matcher

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import graft.schema.PairSchema

/** Batch-inference boundary for external (non-JVM-trainable) matchers —
  * the Spark story for the reference's neural wrappers (SURVEY.md §2.9:
  * DeepMatcher/DeepER/BERT all reduce to "score a batch of pair rows").
  *
  * mapPartitions with a per-partition handle is the Scala analog of
  * arrow-batched Python UDFs: `makeScorer` runs once per partition
  * (load the ONNX session / model file there), then scores row batches
  * of `batchSize` (reference batch sizes: 8 for BERT, 4·k for candidate
  * search). The scorer receives the pair's attribute texts per side and
  * returns the match probability.
  *
  * No model runtime ships in this container, so tests plug in a
  * deterministic function; an ONNX session factory drops in unchanged.
  */
final class ExternalBatchScorer(
    makeScorer: () => Seq[(Seq[String], Seq[String])] => Seq[Double],
    batchSize: Int = 8,
    schema: PairSchema = PairSchema.default) extends ERModel {

  // external model inference dominates any candidate-pruning pass
  override def costlyScorer: Boolean = true

  override def predict(pairs: DataFrame): DataFrame = {
    val lCols = pairs.columns.filter(c => c.startsWith(schema.lprefix) && c != schema.lid)
    val rCols = pairs.columns.filter(c => c.startsWith(schema.rprefix) && c != schema.rid)
    val lIdx = lCols.map(c => pairs.columns.indexOf(c))
    val rIdx = rCols.map(c => pairs.columns.indexOf(c))
    val outSchema = StructType(pairs.schema.fields ++ Seq(
      StructField("nomatch_score", DoubleType, nullable = false),
      StructField("match_score", DoubleType, nullable = false)))
    val bs = batchSize
    val rdd = pairs.rdd.mapPartitions { it =>
      val scorer = makeScorer() // per-partition init (model load)
      val out = it.grouped(bs).flatMap { batch =>
        val inputs = batch.map { row =>
          (lIdx.map(i => String.valueOf(row.get(i))).toSeq,
            rIdx.map(i => String.valueOf(row.get(i))).toSeq)
        }
        val scores = scorer(inputs)
        batch.zip(scores).map { case (row, p) =>
          Row.fromSeq(row.toSeq ++ Seq(1.0 - p, p))
        }
      }
      // release the session when the partition drains (ONNX sessions
      // hold native memory); the suffix iterator evaluates lazily after
      // `out` exhausts
      out ++ {
        scorer match { case c: AutoCloseable => c.close(); case _ => () }
        Iterator.empty
      }
    }
    pairs.sparkSession.createDataFrame(rdd, outSchema)
  }
}
