package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import graft.sources.BuildCache

/** Cross-JVM artifact cache: build-once semantics, atomic publication,
  * digest availability, and the pruning liveness/exact-match rules.
  */
class BuildCacheSpec extends SparkSpec {

  test("codeDigest resolves and is stable within a JVM") {
    val d = BuildCache.codeDigest
    assert(d.isDefined, "classes-dir digest must resolve under sbt test")
    assert(d.get.length == 16 && d.get.forall(c => c.isDigit || ('a' to 'f').contains(c)))
    assert(BuildCache.codeDigest == d)
  }

  test("dir builds once, then serves the published artifact without rebuilding") {
    val calls = new AtomicInteger(0)
    // unique spec per test run so prior cache state can't interfere
    val spec = s"spec-${System.nanoTime()}"
    def get() = BuildCache.dir("spectest", "/tmp/fake-data", spec) { p =>
      calls.incrementAndGet()
      Files.createDirectories(Paths.get(p))
      Files.writeString(Paths.get(p, "artifact.txt"), "built")
    }
    val d1 = get()
    val d2 = get()
    assert(calls.get() == 1, "second call must hit the cache")
    assert(d1 == d2)
    assert(Files.readString(Paths.get(d1, "artifact.txt")) == "built")
    // publication is the final name (no .build_ residue)
    assert(!Paths.get(d1).getFileName.toString.startsWith(".build_"))
    val parent = Paths.get(d1).getParent
    val ls = Files.list(parent)
    val residue =
      try ls.iterator().asScala.count(_.getFileName.toString.startsWith(".build_spectest"))
      finally ls.close()
    assert(residue == 0, "no half-build dirs may remain after publication")
  }

  test("a failed build publishes nothing and the next call rebuilds") {
    val calls = new AtomicInteger(0)
    val spec = s"fail-${System.nanoTime()}"
    def attempt(fail: Boolean) =
      BuildCache.dir("spectest", "/tmp/fake-data", spec) { p =>
        calls.incrementAndGet()
        Files.createDirectories(Paths.get(p))
        if (fail) sys.error("builder died")
        Files.writeString(Paths.get(p, "ok"), "1")
      }
    intercept[RuntimeException](attempt(fail = true))
    val d = attempt(fail = false)
    assert(calls.get() == 2)
    assert(Files.exists(Paths.get(d, "ok")), "retry must publish a complete artifact")
  }
}
