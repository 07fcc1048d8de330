package graft

import java.nio.file.{FileVisitResult, Files, Path, SimpleFileVisitor}
import java.nio.file.attribute.BasicFileAttributes

/** Local-filesystem helpers for the queries that stage per-invocation
  * fixture/artifact directories (q64, q78, q81, the IVF index). */
object Fs {

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
