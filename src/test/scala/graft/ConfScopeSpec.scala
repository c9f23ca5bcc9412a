package graft

import org.apache.spark.sql.functions._
import graft.operators.ConfScope

/** ConfScope: scoped shuffle-partition overrides must never leak into
  * the caller's session — the round-9 verdict's concurrency hazard
  * (an operator's conf window silently re-planning a concurrent
  * query at the operator's width).
  */
class ConfScopeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("rebinding changes planned shuffle width, not the caller's conf") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "k")
    val sized = ConfScope.shufflePartitions(df, 8)
    assert(sized.sparkSession ne spark)
    assert(sized.sparkSession.conf.get("spark.sql.shuffle.partitions") == "8")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
    // rows are the same frame
    assert(sized.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    // memoized: one fork per (parent, width)
    assert(ConfScope.shufflePartitions(df, 8).sparkSession eq
      sized.sparkSession)
    // exit edge: bindTo returns to the caller's session
    assert(ConfScope.bindTo(sized, spark).sparkSession eq spark)
  }

  test("parent runtime conf set AFTER forking stays visible in the fork") {
    import spark.implicits._
    val df = Seq(1L).toDF("id")
    ConfScope.shufflePartitions(df, 8) // fork exists
    val key = "spark.sql.graftConfScopeSpecProbe" // any string conf passes through
    try {
      spark.conf.set(key, "on")
      val fork = ConfScope.shufflePartitions(df, 8).sparkSession
      assert(fork.conf.get(key) == "on")
    } finally spark.conf.unset(key)
  }

  test("components closure under ConfScope matches the default plan's mapping") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (7L, 7L))
      .toDF("id_a", "id_b")
    val base = graft.dedup.Components.connectedComponents(edges)
    val scoped = graft.dedup.Components.connectedComponents(
      ConfScope.shufflePartitions(edges, 8))
    assert(base.orderBy("id").collect().toSeq ==
      scoped.orderBy("id").collect().toSeq)
    base.unpersist(); scoped.unpersist()
  }

  test("pipelineFunnel never mutates the session conf while a concurrent query runs") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val embs = graft.sources.Tables.load(spark, dir, "embeddings")
    @volatile var leaked: Option[String] = None
    @volatile var running = true
    val watcher = new Thread(() => {
      while (running) {
        val v = spark.conf.get("spark.sql.shuffle.partitions")
        if (v != "4") leaked = Some(v)
        Thread.sleep(5)
      }
    })
    watcher.start()
    try {
      val ledger = graft.queries.PipelineQueries
        .pipelineFunnel(spark, docs, embs, semPlanes = 4, semProbe = 0)
        .collect()
      assert(ledger.length == 7)
    } finally { running = false; watcher.join() }
    assert(leaked.isEmpty,
      s"session conf mutated to ${leaked.getOrElse("?")} during the funnel")
    // and a query planned right after still runs at the session width
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
  }
}
