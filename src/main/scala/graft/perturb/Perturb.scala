package graft.perturb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schema.PairSchema

/** G3 perturbation generator (reference triangles_method.py:72-121
  * createPerturbationsFromTriangle).
  *
  * For every triangle <u, v, w> and every attribute subset of size
  * `depth` on the free record's side, emit one pair row where the free
  * record has the subset's values copied over from the donor record,
  * paired with the constant pivot v. When explaining class 1 the free
  * record is u and the donor w; for class 0 they swap
  * (triangles_method.py:84-105).
  *
  * The reference loops triangle-by-triangle on the driver
  * (triangles_method.py:278-292) building pandas frames; here the whole
  * triangles frame flows through one declarative plan: resolve the
  * three vertex records once (triangles are bounded by num_triangles,
  * so they broadcast and the sources stream — the only shape that
  * survives 100 TB sources), then per depth explode a literal subset
  * array and select each attribute through `when(array_contains(...))`
  * — Generator + Project fused by whole-stage codegen, no driver
  * fan-out, linear in |triangles| × C(#attrs, depth).
  *
  * [[resolve]] is depth-independent; the explainer caches its two
  * frames so the per-depth loop replays only the explode+project, not
  * the source joins.
  */
object Perturb {

  /** All size-`depth` subsets of `attrs` in combinations order
    * (reference _powerset, triangles_method.py:20-22).
    */
  def subsets(attrs: Seq[String], depth: Int): Seq[Seq[String]] =
    attrs.combinations(depth).map(_.toIndexedSeq).toIndexedSeq

  /** Triangles with their vertex records joined in, split by the free
    * record's side. `left`/`right` carry columns `u,v,w` plus
    * `__u_<attr>`, `__w_<attr>` (free-side schema) and `__v_<attr>`
    * (pivot-side schema).
    */
  final case class ResolvedTriangles(
      left: DataFrame, right: DataFrame,
      lAttrs: Seq[String], rAttrs: Seq[String]) {
    def cache(): ResolvedTriangles = { left.cache(); right.cache(); this }
    def unpersist(): Unit = { left.unpersist(); right.unpersist() }
  }

  /** Join each triangle's three vertices to their records — once, for
    * all depths. The triangles side is broadcast (≤ num_triangles rows
    * by construction); each join streams a source exactly once.
    */
  def resolve(
      triangles: DataFrame,
      lsource: DataFrame,
      rsource: DataFrame,
      schema: PairSchema = PairSchema.default): ResolvedTriangles = {

    val lAttrs = lsource.columns.filter(_ != "id").toIndexedSeq
    val rAttrs = rsource.columns.filter(_ != "id").toIndexedSeq

    def renamed(src: DataFrame, role: String): DataFrame =
      src.select(src.columns.map(c => col(c).as(s"__${role}_$c")).toIndexedSeq: _*)

    def joinSide(tri: DataFrame, freeSrc: DataFrame, pivotSrc: DataFrame): DataFrame =
      tri.hint("broadcast")
        .join(renamed(freeSrc, "u"),
          schema.vertexRecordId(col("u")) === col("__u_id").cast("string"))
        .hint("broadcast")
        .join(renamed(freeSrc, "w"),
          schema.vertexRecordId(col("w")) === col("__w_id").cast("string"))
        .hint("broadcast")
        .join(renamed(pivotSrc, "v"),
          schema.vertexRecordId(col("v")) === col("__v_id").cast("string"))

    val leftTri = triangles.filter(schema.vertexIsLeft(col("u")))
    val rightTri = triangles.filter(!schema.vertexIsLeft(col("u")))
    ResolvedTriangles(
      joinSide(leftTri, lsource, rsource),
      joinSide(rightTri, rsource, lsource),
      lAttrs, rAttrs)
  }

  /** Generate all perturbations for one lattice depth from resolved
    * triangles: explode + project only — no joins, no source scans.
    *
    * @return pair rows (ltable_* / rtable_* attrs, no ids) ⊕
    *         alteredAttributes, droppedValues, copiedValues, triangle
    */
  def forDepth(
      resolved: ResolvedTriangles,
      depth: Int,
      classToExplain: Int,
      schema: PairSchema): DataFrame = {

    def generate(joined: DataFrame, freeSide: String): DataFrame = {
      val (freeAttrs, pivotAttrs, freePrefix, pivotPrefix) =
        if (freeSide == "l")
          (resolved.lAttrs, resolved.rAttrs, schema.lprefix, schema.rprefix)
        else
          (resolved.rAttrs, resolved.lAttrs, schema.rprefix, schema.lprefix)

      val (freeRole, donorRole) = if (classToExplain == 1) ("u", "w") else ("w", "u")

      val prefixedSubsets = subsets(freeAttrs.map(freePrefix + _), depth)
      val exploded = joined.withColumn("alteredAttributes",
        explode(typedLit(prefixedSubsets)))

      val valueOf: Map[String, String => Column] = Map(
        "free" -> ((a: String) => col(s"__${freeRole}_$a")),
        "donor" -> ((a: String) => col(s"__${donorRole}_$a")))

      val freeValueMap = map(freeAttrs.flatMap(a =>
        Seq(lit(freePrefix + a), valueOf("free")(a).cast("string"))): _*)
      val donorValueMap = map(freeAttrs.flatMap(a =>
        Seq(lit(freePrefix + a), valueOf("donor")(a).cast("string"))): _*)

      val perturbedFree = freeAttrs.map { a =>
        when(array_contains(col("alteredAttributes"), freePrefix + a),
          valueOf("donor")(a)).otherwise(valueOf("free")(a)).as(freePrefix + a)
      }
      val pivotCols = pivotAttrs.map(a => col(s"__v_$a").as(pivotPrefix + a))

      val (lCols, rCols) =
        if (freeSide == "l") (perturbedFree, pivotCols) else (pivotCols, perturbedFree)

      exploded.select(
        (lCols ++ rCols ++ Seq(
          col("alteredAttributes"),
          transform(col("alteredAttributes"), a => element_at(freeValueMap, a))
            .as("droppedValues"),
          transform(col("alteredAttributes"), a => element_at(donorValueMap, a))
            .as("copiedValues"),
          concat_ws(" ", col("u"), col("v"), col("w")).as("triangle"))): _*)
    }

    generate(resolved.left, "l").unionByName(generate(resolved.right, "r"))
  }

  /** One-shot convenience (spec surface): resolve + one depth. */
  def forDepth(
      triangles: DataFrame,
      lsource: DataFrame,
      rsource: DataFrame,
      depth: Int,
      classToExplain: Int,
      schema: PairSchema = PairSchema.default): DataFrame =
    forDepth(resolve(triangles, lsource, rsource, schema), depth, classToExplain, schema)
}
