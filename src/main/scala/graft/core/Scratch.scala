package graft.core

/** Per-PROCESS scratch root for every fixed-name staging dir, model
  * path, and roundtrip sink the gated queries use
  * (`$TMPDIR/graft_io/p<nonce>/...`).
  *
  * Why a process nonce (the r14 advisor's mm3 finding, generalized):
  * a deterministic path keyed only on the sf dir is shared by every
  * process on the machine, so two harness processes on the same sf —
  * bench and correctness running concurrently — race each other's
  * overwrite-mode writes (one process's lazy parquet scan reads files
  * the other is mid-rewrite: FileNotFoundException or torn reads), and
  * checkpoint scratch shared across processes corrupts streaming state
  * outright. A per-process root keeps every intra-process property the
  * queries rely on — staging memos still pay their copy once per
  * process, Bench's min-of-N overwrites still reuse one directory —
  * while making cross-process interference structurally impossible.
  *
  * Lifecycle: one shutdown hook deletes the whole root best-effort at
  * JVM exit, so repeated harness runs stop accumulating staged
  * payloads in /tmp (a SIGKILLed JVM leaves its root behind — the
  * documented residue of crash-killing any process mid-write).
  */
object Scratch {

  private val root: java.nio.file.Path = {
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_io", s"p$nonce")
    java.nio.file.Files.createDirectories(p)
    sys.addShutdownHook {
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => try java.nio.file.Files.deleteIfExists(f)
                        catch { case _: Exception => () })
      } catch { case _: Exception => () }
    }
    p
  }

  /** Path under the process root, created as a directory. */
  def dir(name: String): String = {
    val p = root.resolve(name)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** Path under the process root, NOT pre-created — for sinks whose
    * writers own directory creation (parquet/checkpoint writers).
    */
  def path(name: String): String = root.resolve(name).toString
}
