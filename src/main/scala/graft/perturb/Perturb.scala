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
  * triangles frame flows through one declarative plan:
  * broadcast-join the (small) sources for the three vertex records, then
  * explode a literal subset array and select each attribute through a
  * `when(array_contains(...))` — Generator + Project fused by
  * whole-stage codegen, no driver fan-out, linear in
  * |triangles| × C(#attrs, depth).
  */
object Perturb {

  /** All size-`depth` subsets of `attrs` in combinations order
    * (reference _powerset, triangles_method.py:20-22).
    */
  def subsets(attrs: Seq[String], depth: Int): Seq[Seq[String]] =
    attrs.combinations(depth).map(_.toIndexedSeq).toIndexedSeq

  /** Generate all perturbations for one lattice depth.
    *
    * @param triangles     output of [[graft.triangles.Triangles.discover]]
    * @param lsource,rsource un-prefixed entity sources (with `id`)
    * @param depth         attribute-subset size (lattice level)
    * @param classToExplain 0 or 1
    * @return pair rows (ltable_* / rtable_* attrs, no ids) ⊕
    *         alteredAttributes, droppedValues, copiedValues, triangle
    */
  def forDepth(
      triangles: DataFrame,
      lsource: DataFrame,
      rsource: DataFrame,
      depth: Int,
      classToExplain: Int,
      schema: PairSchema = PairSchema.default): DataFrame = {

    val lAttrs = lsource.columns.filter(_ != "id").toIndexedSeq
    val rAttrs = rsource.columns.filter(_ != "id").toIndexedSeq

    def renamed(src: DataFrame, role: String): DataFrame =
      src.select(src.columns.map(c => col(c).as(s"__${role}_$c")).toIndexedSeq: _*)

    /** One side of the union: triangles whose free/donor records live in
      * `side` ("l" → u,w from lsource, pivot from rsource; "r" dual).
      */
    def generate(tri: DataFrame, freeSide: String): DataFrame = {
      val (freeSrc, pivotSrc, freeAttrs, pivotAttrs, freePrefix, pivotPrefix) =
        if (freeSide == "l") (lsource, rsource, lAttrs, rAttrs, schema.lprefix, schema.rprefix)
        else (rsource, lsource, rAttrs, lAttrs, schema.rprefix, schema.lprefix)

      val uRec = broadcast(renamed(freeSrc, "u"))
      val wRec = broadcast(renamed(freeSrc, "w"))
      val vRec = broadcast(renamed(pivotSrc, "v"))

      val joined = tri
        .join(uRec, schema.vertexRecordId(col("u")) === col("__u_id").cast("string"))
        .join(wRec, schema.vertexRecordId(col("w")) === col("__w_id").cast("string"))
        .join(vRec, schema.vertexRecordId(col("v")) === col("__v_id").cast("string"))

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

    val leftTri = triangles.filter(schema.vertexIsLeft(col("u")))
    val rightTri = triangles.filter(!schema.vertexIsLeft(col("u")))
    generate(leftTri, "l").unionByName(generate(rightTri, "r"))
  }
}
