package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Parquet table loading for the harness star schema (repo TESTDATA.md).
  *
  * Reference analog: CSV entity-table loading (reference eval.py:45-48,
  * models/utils.py:36-40). Here the harness fixtures are parquet; CSV
  * loading for DeepMatcher-style ER datasets lives in [[ErSources]].
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** S1: columnar scan with pushdown — projections/filters applied by the
    * caller reach the parquet reader via Catalyst (PushedFilters).
    *
    * events.parquet has shipped with `ts` as TIMESTAMP(NANOS) in some
    * fixture generations and TIMESTAMP(MICROS, non-UTC-adjusted) in
    * others; [[normalizeTs]] accepts either and yields one canonical
    * TimestampType `ts` (micros precision under the UTC session — all
    * our event-time bucketing is ≥ second granularity).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // parquet schema conversion reads this conf through SQLConf.get,
      // which resolves via the THREAD-LOCAL active session — on a thread
      // that never ran an action (e.g. a fresh pool thread driving this
      // session) it falls back to defaults and a NANOS ts fails the read.
      // Pin the active session so the conf.set is visible to this read.
      SparkSession.setActiveSession(spark)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Canonicalize the `ts` column to TimestampType regardless of how the
    * parquet stored it: NANOS arrive as LongType (under nanosAsLong) and
    * are truncated to micros; non-UTC-adjusted MICROS arrive as
    * TIMESTAMP_NTZ and cast value-preserving under the UTC session zone;
    * UTC-adjusted MICROS are already TimestampType.
    */
  def normalizeTs(raw: DataFrame, tsCol: String = "ts"): DataFrame =
    raw.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn(tsCol,
          expr(s"$tsCol").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }

  /** [[load]] + fan-out for tables feeding per-row-HEAVY operators
    * (minhash folds, language-ID aggregates, pair scoring): single-file
    * fixtures arrive as one parquet row group, so the plain scan yields
    * ONE partition and per-row compute serializes on one core — parquet
    * cannot split below row-group granularity, so files.maxPartitionBytes
    * cannot help. Fanning out is a full round-robin shuffle, so it is
    * opt-in per call site, NOT applied at every load: an unconditional
    * Exchange pollutes every relational plan and re-executes inside
    * every recomputation of uncached lineage (round-3 lesson).
    * Genuinely large inputs — the 100 TB case — come as many files/row
    * groups, split naturally, and skip the repartition.
    */
  def loadFanned(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = load(spark, dir, name)
    val bytes = dataBytes(spark, s"$dir/$name.parquet")
    if (bytes > 0L && bytes < (128L << 20))
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
  }

  /** Real data size of a file OR directory-style parquet dataset via the
    * Hadoop filesystem (java.io.File.length() on a directory returns the
    * ~4KB directory entry, which would mis-classify arbitrarily large
    * directory-backed tables as "small").
    */
  private def dataBytes(spark: SparkSession, path: String): Long =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      fs.getContentSummary(p).getLength
    } catch { case _: Throwable => 0L }
}

/** Round-trip helpers for the other columnar/row formats Spark ships
  * (ORC: columnar with pushdown parity to parquet; JSON lines: the
  * interchange format export pipelines ask for). Parquet stays the
  * primary format everywhere; these exist so a reference user's
  * format-conversion jobs have a direct surface.
  */
object Formats {
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
  def readJsonLines(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    // always pass a schema in production: schema inference re-reads
    // the whole dataset once before the real job
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }
}

/** CSV source/sink for DeepMatcher-convention ER datasets
  * (reference eval.py:45-48: tableA/tableB/train/valid/test CSVs).
  */
object ErSources {
  /** S1 CSV variant: header + inferred schema, as pd.read_csv does. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S2: CSV sink (reference eval.py:172-173). coalesce(1) keeps
    * golden-file compatibility for small explanation outputs; large
    * outputs should pass coalesce = false.
    */
  def writeCsv(df: DataFrame, path: String, coalesce: Boolean = true): Unit = {
    val out = if (coalesce) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** S5: word-embedding text source (reference DeepER.py:20-32 GloVe
    * loader): `word v1 v2 ...` lines → broadcast word→vector map for
    * executor-side feature building.
    */
  def readEmbeddingText(spark: SparkSession, path: String)
      : org.apache.spark.broadcast.Broadcast[Map[String, Array[Float]]] = {
    val entries = spark.read.textFile(path).rdd
      .map { line =>
        val parts = line.trim.split("\\s+")
        parts.head -> parts.tail.map(_.toFloat)
      }
      .collectAsMap().toMap
    spark.sparkContext.broadcast(entries)
  }
}
