package graft.explain

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lattice debug structures (reference utils.py:84-177 `lattice`,
  * explain.py:79-153 debug branch): the per-triangle powerset of
  * perturbed attribute sets with their match scores, plus a Hasse
  * diagram Graphviz emitter (S4 dot sink).
  *
  * Assembly from persisted predictions is the A6 group-by-triangle
  * collect (one distributed job); the Hasse graph itself is driver-side
  * string building over ≤ 2^attrs elements, as in the reference.
  */
final case class Lattice(
    elements: IndexedSeq[Set[String]],
    ranks: IndexedSeq[Double],
    triangle: String) {

  private def leq(a: Set[String], b: Set[String]): Boolean = a.subsetOf(b)

  def top: Set[String] = elements.reduce(_ union _)
  def bottom: Set[String] = elements.reduce(_ intersect _)

  /** Hasse-diagram dot code (reference hasse(), utils.py:129-173):
    * bottom-to-top cover edges; nodes colored green when the match
    * score exceeds 0.5, red when below.
    */
  def hasse: String = {
    def label(s: Set[String]): String = s.toSeq.sorted.mkString("{", "/", "}")
    val sb = new StringBuilder
    sb.append("digraph G {\nsplines=\"line\"\nrankdir=BT\n")
    sb.append("\"").append(label(top)).append("\" [shape=box];\n")
    sb.append("\"").append(label(bottom)).append("\" [shape=box];\n")
    for (i <- elements.indices) {
      // cover edges: minimal strict supersets not already reachable
      val covers = scala.collection.mutable.ArrayBuffer.empty[Int]
      for (j <- elements.indices
           if i != j && leq(elements(i), elements(j))
           if !covers.exists(c => leq(elements(c), elements(j))))
        covers += j
      val color =
        if (ranks(i) > 0.5) "green" else if (ranks(i) < 0.5) "red" else ""
      sb.append("\"").append(label(elements(i)))
        .append("\" [color=").append(color).append("];\n")
      for (j <- covers)
        sb.append("\"").append(label(elements(i))).append("\" -> \"")
          .append(label(elements(j))).append("\";\n")
    }
    sb.append("}")
    sb.toString
  }

  /** S4 dot sink (reference generate.py:124-128). */
  def writeDot(path: String): Unit =
    Files.writeString(Paths.get(path), hasse)
}

object Lattice {

  /** A6: build one lattice per triangle from scored perturbations
    * (columns: triangle, alteredAttributes, match_score) — group by
    * triangle, collect the (attrSet, score) pairs, assemble on the
    * driver (lattices are debug artifacts of ≤ 2^attrs elements).
    *
    * Entries sort by their "a/b"-joined set label before assembly:
    * `collect_list` order is partition-arrival order, and a debug
    * artifact whose dot output changes between identical runs is
    * useless as a replay/diff surface (the q174 golden pins the
    * sorted form).
    */
  def fromPredictions(predictions: DataFrame,
      originalScore: Double, allAttributes: Set[String]): Seq[Lattice] = {
    val grouped = predictions
      .groupBy(col("triangle"))
      .agg(collect_list(struct(col("alteredAttributes"), col("match_score")))
        .as("entries"))
      .collect()
    grouped.toIndexedSeq.sortBy(_.getString(0)).map { row =>
      val tri = row.getString(0)
      val entries = row.getSeq[org.apache.spark.sql.Row](1).map { e =>
        (e.getSeq[String](0).toSet, e.getDouble(1))
      }.sortBy { case (s, score) => (s.toSeq.sorted.mkString("/"), score) }
      // bottom = empty set (original prediction), top = all attributes
      val elems = (Set.empty[String] +: entries.map(_._1)) :+ allAttributes
      val ranks = (originalScore +: entries.map(_._2)) :+
        entries.map(_._2).lastOption.getOrElse(originalScore)
      Lattice(elems.toIndexedSeq, ranks.toIndexedSeq, tri)
    }
  }
}
