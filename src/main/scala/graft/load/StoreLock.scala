package graft.load

/** Store-level single-writer lock for the staged-swap DML protocol.
  *
  * The swap/recovery machinery in [[GraphLoader]] is only safe when
  * writers to one store are serialized: a recovery sweep that runs
  * concurrently with another writer's in-flight swap could delete that
  * writer's `.old_`/`.staging_` dirs mid-rename. The HTTP server
  * serializes its own writers, but `Dml.execute`/`GraphLoader.*` are
  * public and callable from a second process (e.g. the CLI) against a
  * store a live server is writing. This lock closes that hole:
  *
  *  - intra-process: a per-canonical-path monitor (reentrant per
  *    thread, so nested entry-point calls don't self-deadlock);
  *  - inter-process: an OS advisory `FileLock` on `<store>/.write.lock`
  *    (blocks until the other process releases — writers queue, never
  *    interleave).
  *
  * Readers are NOT serialized here — read isolation is the generation
  * mechanism in [[GraphLoader]]/the server, not this lock.
  */
object StoreLock {

  private val monitors = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private val held = ThreadLocal.withInitial[java.util.HashSet[String]](() =>
    new java.util.HashSet[String]())

  def withWriteLock[T](outDir: String)(f: => T): T = {
    val canon = java.nio.file.Paths.get(outDir).toAbsolutePath.normalize.toString
    if (held.get.contains(canon)) return f // reentrant: outer call holds it
    val monitor = monitors.computeIfAbsent(canon, _ => new Object)
    monitor.synchronized {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(canon))
      val lockPath = java.nio.file.Paths.get(canon, ".write.lock")
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val fl = ch.lock()
        held.get.add(canon)
        try f finally { held.get.remove(canon); fl.release() }
      } finally ch.close()
    }
  }
}
