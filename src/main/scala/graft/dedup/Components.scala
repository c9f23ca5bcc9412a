package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the cluster-resolution step that turns near-duplicate PAIRS
  * ([[Dedup.nearDuplicates]], [[Dedup.simhashNearDuplicates]],
  * [[graft.similarity.Ann.nearNeighborPairs]]) into dedup CLUSTERS
  * with one deterministic survivor each. Pair emission alone
  * under-deletes: if A~B and B~C but A!~C, keeping "one of each pair"
  * retains two of the three docs; the transitive closure keeps one.
  *
  * Algorithm: alternating large-star / small-star rounds (Kiveris,
  * Lattanzi, Mirrokni, Rastogi & Vassilvitskii, "Connected Components
  * in MapReduce and Beyond", ACM SoCC 2014). Each round rewires every
  * edge toward the smallest id seen in its neighborhood; the edge set
  * converges to per-component stars centered on the component minimum
  * in O(log n) rounds — the shape that survives 100 TB, unlike
  * label-propagation variants whose round count is the graph DIAMETER
  * (a duplicate chain of length k would need k rounds).
  *
  * Every round is two window aggregations + distinct (shuffles on the
  * star center); no adjacency lists are ever collected — a hot vertex
  * costs a sort-run, not an array materialization. Per-round frames
  * are persisted for the convergence check and released as soon as
  * the next round materializes; the RETURNED mapping is persisted and
  * caller-owned (unpersist when done — the library itself pins
  * nothing beyond it, same ownership contract as `IvfIndex`).
  */
object Components {

  /** Map each vertex of `edges` to its component representative (the
    * minimum vertex id in the component). Vertices not appearing in
    * any edge are absent (callers union isolated ids if needed);
    * self-loops are ignored. Returns (id, rep), one row per distinct
    * vertex, including (rep, rep) for the representative itself.
    *
    * Cost-based path choice: the canonical edge count falls out of the
    * round-0 convergence checksum for free, and when it is at most
    * `driverEdgeThreshold` (long-typed ids only) the closure runs as a
    * single bounded collect + path-compressed union-find on the driver
    * — near-dup edge sets are usually orders of magnitude below the
    * corpus, and O(log n) alternating-star shuffle rounds cost more
    * than reading ≤ threshold pairs once. Above the threshold (or for
    * non-long ids) the distributed large-star/small-star loop runs
    * unchanged — the 100 TB default. Both paths produce the identical
    * mapping (spec-pinned).
    *
    * `roundObserver` is a measurement seam: the distributed loop calls
    * it after every completed round with (round index starting at 1,
    * canonical edge count after the round). The O(log n) round-count
    * claim is measured through it (ScaleSmoke's closure legs), not
    * asserted; the driver union-find path never calls it (no rounds).
    */
  def connectedComponents(edges: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxIter: Int = 25,
      driverEdgeThreshold: Long = 1L << 20,
      roundObserver: (Int, Long) => Unit = (_, _) => ()): DataFrame = {
    val spark = edges.sparkSession
    val schema = edges
      .select(col(aCol).as("u"), col(bCol).as("v")).schema
    // Each round must TRUNCATE lineage, not just cache: both star
    // passes reference their input twice (self-union / self-window),
    // so composed plans grow ~4× per round — exponential in rounds,
    // an OOM at plan-stringification long before execution. Pinning
    // the round's rows as an RDD and rebuilding a DataFrame over it
    // keeps every round's plan constant-size; the RDD handle gives
    // deterministic block release (unlike localCheckpoint, whose
    // blocks only die on GC).
    def pin(df: DataFrame): (org.apache.spark.rdd.RDD[org.apache.spark.sql.Row],
        DataFrame) = {
      val rdd = df.rdd.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (rdd, spark.createDataFrame(rdd, schema))
    }
    var (curRdd, cur) = pin(canonical(
      edges.select(col(aCol).as("u"), col(bCol).as("v"))))
    var curSum = checksum(cur)
    val longIds = schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (longIds && curSum._1 <= driverEdgeThreshold) {
      // driver union-find over the pinned canonical edges (reads the
      // persisted blocks — no recompute of the edge lineage)
      val rows = cur.collect()
      curRdd.unpersist(blocking = false)
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        // path compression
        var c = x
        while (parent.getOrDefault(c, c) != c) {
          val nxt = parent.get(c); parent.put(c, r); c = nxt
        }
        r
      }
      rows.foreach { row =>
        val (u, v) = (row.getLong(0), row.getLong(1))
        parent.putIfAbsent(u, u); parent.putIfAbsent(v, v)
        val (ru, rv) = (find(u), find(v))
        // union by MIN: the representative is the component minimum
        if (ru != rv) {
          if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv)
        }
      }
      val out = new java.util.ArrayList[org.apache.spark.sql.Row]()
      val it0 = parent.keySet().iterator()
      while (it0.hasNext) {
        val id = it0.next()
        out.add(org.apache.spark.sql.Row(id, find(id)))
      }
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rep",
          org.apache.spark.sql.types.LongType)))
      // LocalRelation: nothing pinned, caller's unpersist is a no-op
      return spark.createDataFrame(out, outSchema)
    }
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val (nextRdd, next) = pin(canonical(smallStar(largeStar(cur))))
      val nextSum = checksum(next) // materializes next's blocks
      curRdd.unpersist(blocking = false)
      converged = nextSum == curSum
      curRdd = nextRdd
      cur = next
      curSum = nextSum
      it += 1
      roundObserver(it, nextSum._1)
    }
    // converged edges are stars (child, componentMin)
    val mapping = cur
      .select(col("u").as("id"), col("v").as("rep"))
      .union(cur.select(col("v").as("id"), col("v").as("rep")))
      .distinct()
      .persist()
    mapping.count() // pin before releasing the final iteration frame
    curRdd.unpersist(blocking = true)
    mapping
  }

  /** Cluster census from a mapping: representative, size, id checksum. */
  def clusters(mapping: DataFrame): DataFrame =
    mapping.groupBy(col("rep"))
      .agg(count(lit(1)).as("cluster_size"), sum(col("id")).as("sum_ids"))

  /** Orient large→small, drop self-loops, dedup — the canonical form
    * whose (count, hash-sum) checksum decides convergence.
    */
  private def canonical(e: DataFrame): DataFrame =
    e.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()

  /** Large-star: every vertex connects its LARGER neighbors to the
    * minimum of its neighborhood (including itself) — long tendrils
    * contract toward small ids.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val w = Window.partitionBy(col("u"))
    sym.withColumn("m", least(min(col("v")).over(w), col("u")))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star: every vertex connects its smaller neighbors (and
    * itself) to the minimum among them.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = canonical(e) // u > v for every row
    val w = Window.partitionBy(col("u"))
    val withM = or.withColumn("m", min(col("v")).over(w))
    withM.select(col("v").as("u"), col("m").as("v"))
      .union(withM.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** (row count, sum of row hashes) — an order-independent edge-set
    * fingerprint; equal fingerprints across consecutive canonical
    * rounds terminate the loop (collision odds over 64-bit hash sums
    * are negligible against maxIter as the hard backstop). The sum
    * runs in decimal: a long sum of 64-bit hashes overflows — an ANSI
    * error, and pre-ANSI a silent wrap.
    */
  private def checksum(e: DataFrame): (Long, BigDecimal) = {
    val r = e.agg(count(lit(1)),
      sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
    (r.getLong(0),
      if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
  }
}
