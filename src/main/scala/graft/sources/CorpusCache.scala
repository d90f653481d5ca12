package graft.sources

/** Shared machinery for the marker-cached synthetic-corpus dirs
  * ([[ScaledCorpus]], graft.ScaleGen's dup/crawl/embed modes): a
  * collision-resistant path token and ATOMIC publication.
  *
  * Why (r16, the ScaleGen ADVICE generalized to every cached corpus):
  *  - `String.hashCode` collides — two source dirs could map onto ONE
  *    cached path and thrash each other's stamps; the token is a
  *    SHA-256 prefix instead.
  *  - data used to land in the final path BEFORE the marker, so a
  *    concurrent second process — the exact shared-entry use-case the
  *    cache exists for — could read a half-written corpus. [[publish]]
  *    generates into a pid-suffixed temp dir, stamps the marker there
  *    LAST, and renames the whole dir into place: a reader sees
  *    nothing or a complete stamped corpus, never a prefix.
  */
object CorpusCache {

  /** Collision-resistant path token for a source dir. */
  def pathToken(srcDir: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(srcDir.getBytes("UTF-8")).take(8)
      .map(b => f"$b%02x").mkString
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
      finally s.close()
    }
  }

  /** Marker-gated atomic corpus publication: when `out/markerName`
    * does not carry `stamp`, run `write` against a temp dir, stamp it,
    * and atomically move it into place. A lost publication race defers
    * to the winner iff its stamp matches, else the conflict surfaces.
    *
    * The check-replace-move sequence holds an OS-level [[java.nio
    * .channels.FileLock]] on a sibling `.lock` file (r17, closing the
    * r16 TOCTOU: between the re-check and the replacement a concurrent
    * process could publish a VALID corpus which this one then deleted
    * from under that process's readers). Generation itself runs
    * outside the lock — only the cheap check + rename is serialized —
    * and a stale previous corpus is MOVED ASIDE to a pid-keyed trash
    * name rather than deleted in place, so even a lock-bypassing
    * legacy writer never sees files vanish mid-read; the trash is
    * reaped after the new corpus is live. */
  def publish(out: String, markerName: String, stamp: String)
             (write: String => Unit): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
    val outPath = Paths.get(out)
    val marker = outPath.resolve(markerName)
    def published(): Boolean =
      Files.exists(marker) && Files.readString(marker) == stamp
    if (!published()) {
      val tmp = Paths.get(out + s".tmp.${ProcessHandle.current.pid}")
      deleteRecursively(tmp)
      write(tmp.toString)
      Files.writeString(tmp.resolve(markerName), stamp)
      // Serialize the re-check + replacement under the sibling lock:
      // blocking lock() — the loser waits out the winner's (cheap)
      // critical section, re-checks, and discards its own tmp work.
      // FileLock is held per-PROCESS: a second thread of the SAME JVM
      // reaching lock() would throw OverlappingFileLockException
      // rather than wait, so the OS lock nests inside a JVM-level
      // monitor keyed by the output path (intra-process publishers
      // queue on the monitor, inter-process ones on the file lock).
      val lockPath = Paths.get(out + ".lock")
      Option(lockPath.getParent).foreach(Files.createDirectories(_))
      jvmLock(out).synchronized {
      val ch = java.nio.channels.FileChannel.open(lockPath,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try {
          if (published()) deleteRecursively(tmp)
          else {
            // reap orphaned trash from ANY earlier publisher first
            // (r18 ADVICE fix: the reap below is pid-keyed, so a crash
            // between move-aside and reap leaked a dir no later run —
            // which has a different pid — would ever find; under the
            // lock nothing is mid-publish, and trash only ever holds
            // STALE corpora)
            reapTrash(out)
            // stale or absent — move the old dir ASIDE (never delete a
            // path a reader may hold open), then rename the new one in
            val trash = Paths.get(out + s".trash.${ProcessHandle.current.pid}")
            deleteRecursively(trash)
            if (Files.exists(outPath))
              Files.move(outPath, trash, StandardCopyOption.ATOMIC_MOVE)
            try Files.move(tmp, outPath, StandardCopyOption.ATOMIC_MOVE)
            catch {
              case e: java.nio.file.FileSystemException =>
                val ok = published()
                deleteRecursively(tmp)
                if (!ok) {
                  // restore what we moved aside rather than leaving
                  // outPath empty with the old corpus stranded in
                  // trash (r18 ADVICE fix); best-effort — the
                  // original failure is the one to surface
                  if (Files.exists(trash) && !Files.exists(outPath))
                    try Files.move(trash, outPath,
                      StandardCopyOption.ATOMIC_MOVE)
                    catch { case _: java.nio.file.FileSystemException => () }
                  throw e
                }
            }
            deleteRecursively(trash)
          }
        } finally lock.release()
      } finally ch.close()
      }
    }
    out
  }

  /** Delete every sibling `<out>.trash.*` dir regardless of owning
    * pid — called under the publish lock, where any trash present is
    * a crashed publisher's orphaned stale corpus. */
  private def reapTrash(out: String): Unit = {
    import java.nio.file.{Files, Paths}
    val outPath = Paths.get(out)
    val dir = Option(outPath.getParent).getOrElse(Paths.get("."))
    val prefix = outPath.getFileName.toString + ".trash."
    if (Files.isDirectory(dir)) {
      val s = Files.list(dir)
      try s.filter(p => p.getFileName.toString.startsWith(prefix))
        .forEach(p => deleteRecursively(p))
      finally s.close()
    }
  }

  // one monitor object per canonical output path (bounded: the cache
  // path universe is the handful of scaled-corpus dirs per process)
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def jvmLock(out: String): Object =
    jvmLocks.computeIfAbsent(
      java.nio.file.Paths.get(out).normalize.toString, _ => new Object)
}
