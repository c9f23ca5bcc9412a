package graft.triangles

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.schema.PairSchema

/** Open-triangle discovery (reference triangles_method.py:25-53
  * getMixedTriangles).
  *
  * A triangle is a triple <u, v, w> where <u, v> is a match-classified
  * pair and <v, w> a no-match-classified pair sharing the pivot v
  * (comment at triangles_method.py:26). The reference finds them with an
  * O(|pos|·|neg|) pandas scan loop; here they are two hash equi
  * self-joins (positives ⋈ negatives on each pivot side) — shuffle-free
  * when the support set is broadcast-sized (it is ≤ num_triangles ≈ 100
  * rows by construction), sort-merge at cluster scale.
  */
object Triangles {

  /** Discover mixed triangles from a labeled support-pair frame whose
    * `id` column is the composite `"0@<lid>#1@<rid>"`.
    *
    * Output columns (all sided `"<src>@<id>"` strings):
    *   - u: the record matched with the pivot (from the positive pair)
    *   - v: the shared pivot
    *   - w: the support record (from the negative pair)
    */
  def discover(dataset: DataFrame, schema: PairSchema = PairSchema.default): DataFrame = {
    val withSides = dataset.select(
      element_at(split(col("id"), "#"), 1).as("lv"),
      element_at(split(col("id"), "#"), 2).as("rv"),
      col("label").cast("int").as("label"))
    val pos = withSides.filter(col("label") === 1).select(
      col("lv").as("pos_l"), col("rv").as("pos_r"))
    val neg = withSides.filter(col("label") === 0).select(
      col("lv").as("neg_l"), col("rv").as("neg_r"))

    // left-open: positive (l1, r) + negative (l2, r) → <l1, r, l2>
    val leftOpen = pos.join(neg, col("pos_r") === col("neg_r"))
      .select(col("pos_l").as("u"), col("pos_r").as("v"), col("neg_l").as("w"))
    // right-open (dual): positive (l, r1) + negative (l, r2) → <r1, l, r2>
    val rightOpen = pos.join(neg, col("pos_l") === col("neg_l"))
      .select(col("pos_r").as("u"), col("pos_l").as("v"), col("neg_r").as("w"))

    leftOpen.unionByName(rightOpen)
  }
}
