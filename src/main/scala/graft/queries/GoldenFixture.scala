package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Freshness guard for the frozen-golden oracles: every golden in
  * [[GoldenExplainer]], [[GoldenLive]], [[GoldenMetrics]] and
  * `PipelineQueries.q96Golden` binds to the CONTENT of specific fixture
  * columns, and the driver regenerates /root/testdata between rounds —
  * so a content hash of exactly those columns is frozen next to the
  * goldens and compared at round start (GoldenFixtureSpec + a loud
  * warning in `graft.Verify`). A mismatch means the fixtures changed
  * and the goldens must be regenerated with `runMain
  * graft.tools.GoldenGen` BEFORE trusting any golden query result;
  * without this guard a regenerated fixture surfaces as inscrutable
  * hash-red golden queries instead of one actionable message.
  *
  * The hash is an order-free SUM of per-row xxhash64 over the
  * dependency columns (cast to string so type cosmetics don't flip
  * it), mod a prime — portable across partitionings and runs.
  */
object GoldenFixture {

  /** (table, dependency columns) per golden family. `part` feeds the
    * per-SF GoldenLive constants; nation/region feed everything else.
    */
  val dependencies: Seq[(String, Seq[String])] = Seq(
    ("nation", Seq("n_nationkey", "n_name", "n_regionkey")),
    ("region", Seq("r_regionkey", "r_name")),
    ("part", Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size")))

  private val prime = 1000000007L

  def tableHash(df: DataFrame, cols: Seq[String]): Long =
    df.agg(coalesce(sum(pmod(
        xxhash64(cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*),
        lit(prime))), lit(0L)))
      .head().getLong(0)

  def hashes(s: SparkSession, dir: String): Seq[(String, Long)] =
    dependencies.map { case (t, cols) =>
      (t, tableHash(graft.sources.Tables.load(s, dir, t), cols))
    }

  // generated 2026-08-14 by GoldenGen — regenerate together with the
  // golden constants whenever the driver rewrites /root/testdata
  val frozen: Map[String, Seq[(String, Long)]] = Map(
    "sf0.001" -> Seq(("nation", 12422281546L), ("region", 1724110252L),
      ("part", 104408110667L)),
    "sf0.01" -> Seq(("nation", 12422281546L), ("region", 1724110252L),
      ("part", 1005882201409L)),
    "sf0.1" -> Seq(("nation", 12422281546L), ("region", 1724110252L),
      ("part", 10002724405198L)))

  /** Mismatch descriptions for `dir` (empty = fixtures fresh). SF dirs
    * without frozen entries are not checked. A table that fails to LOAD
    * (missing parquet, schema drift) is itself reported as a staleness
    * message rather than crashing the round-start check — the guard's
    * whole job is an actionable warning, not a stack trace.
    */
  def staleness(s: SparkSession, dir: String): Seq[String] = {
    val sfTag = dir.split("/").last
    frozen.get(sfTag).toSeq.flatMap { exp =>
      exp.flatMap { case (t, h) =>
        scala.util.Try(
            tableHash(graft.sources.Tables.load(s, dir, t),
              dependencies.toMap.apply(t))) match {
          case scala.util.Success(got) if got != h =>
            Some(s"$sfTag/$t content hash $got != frozen $h")
          case scala.util.Success(_) => None
          case scala.util.Failure(e) =>
            Some(s"$sfTag/$t failed to load for freshness check: " +
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }
  }
}
