package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** kNN label propagation over an embedding column — the
  * quality-classifier bootstrap: given a SMALL labeled seed set (human
  * ratings, a curated "high-quality" sample, a benchmark-positive set)
  * and a large unlabeled corpus, assign each unlabeled row the
  * majority label of its k nearest seed neighbors by cosine. The
  * standard first pass for corpus-scale quality scoring when no
  * trained classifier exists yet (label a few thousand docs, propagate
  * to billions, then train the real model on the propagated set).
  *
  * Scale shape: the seed BROADCASTS (it is small by construction — the
  * whole point of propagation); the corpus is scanned ONCE, each row
  * scoring |seed| fused cosines ([[Ann.cosine]]); the per-row top-k
  * folds through the bounded map-side aggregate
  * ([[graft.operators.TopK.topKPerGroup]] — k rows per group per task
  * reach the shuffle, never the |corpus|×|seed| score stream); the
  * vote is one count aggregate plus a per-row argmax window over ≤ k
  * label rows. No self-joins, no driver state beyond the seed.
  *
  * Determinism: neighbor selection ties break (cosine DESC, seed id
  * ASC) — the [[Ann.knnJoin]] rule — and vote ties break (votes DESC,
  * label ASC), so the propagated labels replay exactly in a SQL
  * oracle.
  */
object LabelPropagate {

  /** Majority-vote label for every `unlabeled` row: (idCol, label,
    * n_votes) with `n_votes` the winning label's neighbor count among
    * the k nearest seed rows. Seed and corpus ids are assumed
    * disjoint (distinct tables or an upstream split); rows sharing an
    * id are NOT excluded here, unlike knnJoin's self-pair rule.
    */
  def knnVote(unlabeled: DataFrame, labeled: DataFrame, embCol: String,
      idCol: String, labelCol: String, k: Int): DataFrame = {
    val seed = labeled.select(col(idCol).cast("long").as("__lid"),
      col(embCol).as("__lemb"), col(labelCol).as("__lab"))
    val scored = unlabeled.select(col(idCol), col(embCol))
      .crossJoin(broadcast(seed.select(col("__lid"), col("__lemb"))))
      .select(col(idCol),
        Ann.cosine(col(embCol), col("__lemb")).as("__c"), col("__lid"))
    val topk = graft.operators.TopK.topKPerGroup(scored, Seq(idCol),
      col("__c"), col("__lid"), k)
    val votes = topk
      .join(broadcast(seed.select(col("__lid").as("id"), col("__lab"))),
        Seq("id"))
      .groupBy(col(idCol), col("__lab"))
      .agg(count(lit(1)).as("n_votes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("n_votes").desc, col("__lab").asc)
    votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("__lab").as("label"), col("n_votes"))
  }
}
