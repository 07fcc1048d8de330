package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The applied-marker read-merge-swap commit: bootstrap, replay skip,
  * marker carry across swaps, and the complete-before-destroy ordering
  * (q154/q188/q190's additive-fold guard). */
class FsSpec extends AnyFunSuite {

  private def freshBase() = {
    val p = Files.createTempDirectory("graft-fs-spec")
    p
  }

  test("bootstrap batch creates the artifact with its own marker") {
    val base = freshBase()
    val art = base.resolve("art")
    val applied = Fs.appliedMarkerSwap(base, art, 0L) { sib =>
      Files.createDirectories(sib)
      Files.writeString(sib.resolve("data"), "v0")
    }
    assert(applied)
    assert(Files.readString(art.resolve("data")) == "v0")
    assert(Files.exists(art.resolve("_applied_0")))
    Fs.deleteRecursively(base)
  }

  test("a replayed batch id is skipped and the artifact is untouched") {
    val base = freshBase()
    val art = base.resolve("art")
    Fs.appliedMarkerSwap(base, art, 0L) { sib =>
      Files.createDirectories(sib)
      Files.writeString(sib.resolve("data"), "v0")
    }
    var ran = false
    val applied = Fs.appliedMarkerSwap(base, art, 0L) { _ => ran = true }
    assert(!applied && !ran, "redelivered batch must not re-fold")
    assert(Files.readString(art.resolve("data")) == "v0")
    Fs.deleteRecursively(base)
  }

  test("marker set stays bounded and compacted-away ids still dedupe (monotonicity)") {
    val base = freshBase()
    val art = base.resolve("art")
    val n = Fs.MarkerRetention + 8
    (0L until n.toLong).foreach { id =>
      Fs.appliedMarkerSwap(base, art, id) { sib =>
        Files.createDirectories(sib)
        Files.writeString(sib.resolve("data"), s"v$id")
      }
    }
    assert(Files.readString(art.resolve("data")) == s"v${n - 1}")
    val stream = Files.list(art)
    val markers = try {
      val b = Seq.newBuilder[Long]
      stream.filter(p => p.getFileName.toString.startsWith("_applied_"))
        .forEach(p => b += p.getFileName.toString
          .stripPrefix("_applied_").toLong)
      b.result()
    } finally stream.close()
    assert(markers.size == Fs.MarkerRetention,
      s"retention must bound the marker set: ${markers.sorted}")
    assert(markers.max == n - 1L)
    // ids older than the retained window are STILL replay-skipped:
    // batch ids are monotone, so the max marker is a complete record
    (0L until n.toLong).foreach { id =>
      assert(!Fs.appliedMarkerSwap(base, art, id) { _ => fail(s"refold $id") },
        s"compacted id $id must still dedupe")
    }
    Fs.deleteRecursively(base)
  }

  test("markers accumulate across swaps so EVERY prior batch stays deduplicated") {
    val base = freshBase()
    val art = base.resolve("art")
    (0L to 2L).foreach { id =>
      Fs.appliedMarkerSwap(base, art, id) { sib =>
        Files.createDirectories(sib)
        Files.writeString(sib.resolve("data"), s"v$id")
      }
    }
    assert(Files.readString(art.resolve("data")) == "v2")
    (0L to 2L).foreach { id =>
      assert(Files.exists(art.resolve(s"_applied_$id")), s"marker $id carried")
      assert(!Fs.appliedMarkerSwap(base, art, id) { _ => fail(s"refold $id") })
    }
    // no retired/sibling residue after clean commits
    val stream = Files.list(base)
    val names = try {
      val b = Seq.newBuilder[String]
      stream.forEach(p => b += p.getFileName.toString)
      b.result()
    } finally stream.close()
    assert(names == Seq("art"), names.toString)
    Fs.deleteRecursively(base)
  }
}
