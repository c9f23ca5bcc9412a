package graft.tools

/** Scratch-dir routing for the bench/verify entry points.
  *
  * Streaming state stores fsync their delta files every micro-batch and
  * shuffle spills land on the same device, so on a contended root disk
  * the measurement becomes IO-wait rather than engine time (measured:
  * q47 at 13.2 s inside a loaded full-catalog run vs 1.6 s isolated —
  * same code, same data). A production cluster points spark.local.dir
  * at local NVMe or a ramdisk; the single-host equivalent is tmpfs.
  * No-op when /dev/shm is absent or not writable.
  */
object Scratch {

  /** Create a per-process scratch root on tmpfs (when present), point
    * java.io.tmpdir at it — Spark's temp streaming checkpoints and
    * `Files.createTempDirectory` callers follow the property at call
    * time — and return it for spark.local.dir. Call before the
    * SparkSession is created. The root is removed on JVM exit.
    */
  def route(prefix: String): Option[String] = {
    val shm = new java.io.File("/dev/shm")
    if (!(shm.isDirectory && shm.canWrite)) None
    else {
      val dir = java.nio.file.Files.createTempDirectory(shm.toPath, prefix)
      System.setProperty("java.io.tmpdir", dir.toString)
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir.toFile)))
      Some(dir.toString)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      tracked.forEach(deleteRecursively(_))))

  /** A temp directory that is guaranteed to be removed on JVM exit,
    * whatever the entry point. Under Bench/Verify the routed tmpfs root
    * already dies with the JVM; this covers spec runs and ad-hoc
    * sessions where java.io.tmpdir is the real /tmp — repeated runs
    * previously leaked staged parquet (ADVICE round 10). One shared
    * hook drains a queue rather than one hook per call site.
    */
  def tempDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    hookInstalled
    tracked.add(dir.toFile)
    dir.toString
  }
}
