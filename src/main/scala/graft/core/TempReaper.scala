package graft.core

/** JVM-exit cleanup for scratch directories whose contents must outlive
  * the call that created them (declared streaming rows return DataFrames
  * that read the scratch tree LAZILY, so eager deletion would break the
  * later evaluation). One shutdown hook total, registered on first use:
  * per-invocation `sys.addShutdownHook` calls accumulate one hook thread
  * per bench/verify pass (ADVICE r11) for the same exit-time work. */
object TempReaper {
  private val roots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  private lazy val hook: Unit = {
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      roots.forEach { root =>
        // per-root isolation: a failure deleting one root (e.g. a file
        // removed concurrently mid-walk) must not abort cleanup of the
        // remaining registered roots; the walk stream is closed so the
        // hook never leaks directory handles (ADVICE r12)
        try {
          if (Files.exists(root)) {
            val s = Files.walk(root)
            try s.sorted(Comparator.reverseOrder[Path]())
              .forEach(p => Files.deleteIfExists(p))
            finally s.close()
          }
        } catch {
          // NonFatal, not just IOException: Files.walk surfaces
          // iteration-time IO failures as UncheckedIOException (a
          // RuntimeException), which is exactly the file-removed-
          // mid-walk shape this isolation exists for
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"TempReaper: skipping $root (${e.getMessage})")
        }
      }
    }
    ()
  }

  /** Delete `root` recursively at JVM exit. */
  def reapAtExit(root: java.nio.file.Path): Unit = { hook; roots.add(root); () }
}
