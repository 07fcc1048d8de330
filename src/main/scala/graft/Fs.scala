package graft

import java.nio.file.{FileVisitResult, Files, Path, SimpleFileVisitor}
import java.nio.file.attribute.BasicFileAttributes

/** Local-filesystem helpers for the queries that stage per-invocation
  * fixture/artifact directories (q64, q78, q81, the IVF index). */
object Fs {

  // Per-corpus artifact/sink dirs (the q84/q90 lazy-artifact pattern)
  // must outlive their invocation, so each is truncated at the START of
  // the next one — this registry lets Caches.clearAll sweep the residue
  // of a finished corpus in one place instead of leaking it until the
  // next run over the same corpus.
  private val stagedDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  /** Truncate and register a per-corpus staging dir: deletes whatever a
    * previous invocation left (exact re-runs), then records the path so
    * [[sweepStaged]] can reclaim it once the corpus is done. */
  def staged(dir: Path): Path = {
    deleteRecursively(dir)
    stagedDirs.add(dir)
    dir
  }

  /** Delete every dir registered via [[staged]] since the last sweep —
    * called from [[Caches.clearAll]]; always safe (the next invocation
    * re-stages from scratch). */
  def sweepStaged(): Unit = {
    stagedDirs.forEach(deleteRecursively(_))
    stagedDirs.clear()
  }

  /** Best-effort recursive delete via walkFileTree — no directory-stream
    * handle to leak (`Files.walk` returns a Stream that must be closed),
    * and deletion order is inherently children-first. Missing entries
    * (concurrent sweeps) are ignored. */
  def deleteRecursively(dir: Path): Unit = {
    if (!Files.exists(dir)) return
    Files.walkFileTree(dir, new SimpleFileVisitor[Path] {
      override def visitFile(f: Path, attrs: BasicFileAttributes): FileVisitResult = {
        Files.deleteIfExists(f); FileVisitResult.CONTINUE
      }
      // a file listed by the walk but gone by the visit (concurrent
      // sweep) must not abort the cleanup — the default rethrows
      override def visitFileFailed(f: Path, exc: java.io.IOException): FileVisitResult =
        FileVisitResult.CONTINUE
      override def postVisitDirectory(d: Path, exc: java.io.IOException): FileVisitResult = {
        Files.deleteIfExists(d); FileVisitResult.CONTINUE
      }
    })
  }
}
