package graft

/** Per-process scratch directories for query fixtures (the lifecycle
  * queries build real on-disk indexes INSIDE the measured query — see
  * e.g. `dedup_gate_autocompact`). Every dir lands under one per-process
  * root that a JVM shutdown hook deletes recursively, so repeated
  * Verify/Bench/CrossScaleBench runs stop accreting index copies in /tmp
  * (round-14 advisory: the gate fixture alone leaked a full accepted-docs
  * parquet per run). Deletion is on JVM EXIT, not after the query
  * collects: the returned DataFrames read from these dirs lazily, and the
  * driver may re-materialize a query (bench retries do). */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => rm(d.toFile)))
    d
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
    f.delete(): Unit
  }

  /** a fresh scratch dir (absolute path), reclaimed when the JVM exits */
  def dir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix).toString
}
