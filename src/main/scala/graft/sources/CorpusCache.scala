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
    * to the winner iff its stamp matches, else the conflict surfaces. */
  def publish(out: String, markerName: String, stamp: String)
             (write: String => Unit): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val outPath = Paths.get(out)
    val marker = outPath.resolve(markerName)
    def published(): Boolean =
      Files.exists(marker) && Files.readString(marker) == stamp
    if (!published()) {
      val tmp = Paths.get(out + s".tmp.${ProcessHandle.current.pid}")
      deleteRecursively(tmp)
      write(tmp.toString)
      Files.writeString(tmp.resolve(markerName), stamp)
      // RE-CHECK before touching the final path: a concurrent
      // generator may have published a valid corpus while this one was
      // generating — deleting it here would yank files out from under
      // that process's readers (the race this class exists to close).
      // Defer to the winner; this process's tmp work is discarded.
      if (published()) deleteRecursively(tmp)
      else {
        deleteRecursively(outPath) // stale or absent — replace wholesale
        try Files.move(tmp, outPath, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case e: java.nio.file.FileSystemException =>
            val ok = published()
            deleteRecursively(tmp)
            if (!ok) throw e
        }
      }
    }
    out
  }
}
