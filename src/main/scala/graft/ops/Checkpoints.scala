package graft.ops

import org.apache.spark.SparkContext

/** Shared checkpoint-dir bootstrap for the iterative operators
  * ([[Components]], [[PageRank]]): sets a session checkpoint dir ONCE if
  * none is configured, and — because reliable checkpoint files are only
  * reclaimed when the ContextCleaner GCs their RDD references
  * (`spark.cleaner.referenceTracking.cleanCheckpoints`, see
  * [[graft.Sessions]]) — registers one JVM shutdown hook that deletes the
  * auto-created temp dir, so a long-lived session running the registry
  * repeatedly cannot accumulate orphaned checkpoint data for the JVM's
  * lifetime (ADVICE r10). A user-configured checkpoint dir (production:
  * shared storage set before calling in) is never touched: the hook is
  * registered only for the directory THIS helper created.
  */
object Checkpoints {
  private var hooked: Option[java.io.File] = None

  /** Ensure `sc` has a checkpoint dir, creating (and registering cleanup
    * for) a local temp dir if the session has none. */
  def ensureDir(sc: SparkContext): Unit = this.synchronized {
    if (sc.getCheckpointDir.isEmpty) {
      val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
      sc.setCheckpointDir(dir.getAbsolutePath)
      if (hooked.isEmpty) {
        hooked = Some(dir)
        Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(dir)))
      }
    }
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
    ()
  }
}
