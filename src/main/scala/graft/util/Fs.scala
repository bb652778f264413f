package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Tiny filesystem helpers shared by the operational mains. */
object Fs {

  /** Best-effort recursive delete (children before parents). Each
    * entry is attempted independently and traversal failures are
    * swallowed — callers are cleanup paths (shutdown hooks, temp-dir
    * teardown) where a concurrent writer (e.g. Spark's own shutdown
    * hook still flushing a checkpoint) must not abort the sweep with an
    * UncheckedIOException. */
  def deleteRecursively(root: Path): Unit =
    try {
      val walk = Files.walk(root)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach { p =>
        try Files.deleteIfExists(p)
        catch { case _: java.io.IOException => () }
      } finally walk.close()
    } catch {
      case _: java.io.IOException | _: java.io.UncheckedIOException => ()
    }
}
