package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

/** Cross-JVM cache for expensive BUILT artifacts — the one-shot warehouse,
  * the incremental warehouse, the year-partitioned fact. These are pure
  * functions of (source data dir, build code, build spec), yet every new
  * JVM (each bench round, each Verify run) rebuilt them from scratch:
  * r13's bench spent 126 s of its 480 s budget on warmup, ~200 s of
  * overlapped wall on the two warehouse builds alone.
  *
  * Keying: `kind` + data dir + a caller-supplied SPEC string + a DIGEST of
  * the compiled classes whose logic determines the artifact's content
  * (pipeline, sources, model, functions, and the Runner's operator
  * dependencies). Any relevant code change produces a new digest, so a
  * cache hit can never serve output an old build produced under different
  * logic — stale entries for the same (kind, dir, spec) are pruned on the
  * next build. The SPEC must encode caller-side parameters that live
  * outside the digested classes (load ids, run dates, batch predicates):
  * change those → change the spec string.
  *
  * Artifacts are published atomically (build in a sibling dir, one
  * rename), so a killed build never leaves a half-cached artifact; a
  * concurrent builder that loses the rename race adopts the winner's dir.
  * When the code digest is unavailable (running from a jar), every call
  * builds into a fresh temp dir — the prior behavior.
  */
object BuildCache {

  /** Class-file prefixes (relative to the classes root) whose bytes feed
    * the digest. Covers everything [[graft.pipeline.Runner]] and
    * [[Tables]] execute; operator classes are listed individually so
    * unrelated operator work (dedup, embeddings…) doesn't invalidate
    * warehouse caches every round.
    */
  private val digestPrefixes = Seq(
    "graft/pipeline/", "graft/sources/", "graft/model/", "graft/functions/",
    "graft/operators/DateDim", "graft/operators/QualityChecks",
    "graft/operators/Scd1", "graft/operators/Scd2",
    "graft/operators/Surrogates")

  /** 16-hex digest of the relevant compiled classes — handles both a
    * classes directory (forked test JVMs) and a packaged jar (sbt
    * `runMain` ships a bg-jobs jar). None when neither resolves.
    */
  lazy val codeDigest: Option[String] = digestFor(Nil)

  private val digestMemo =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], Option[String]]()

  /** Digest over the baseline [[digestPrefixes]] PLUS caller-supplied
    * class-file prefixes — for artifacts whose content depends on classes
    * outside the warehouse set (e.g. a cached clustering keyed on
    * `graft/operators/Dedup`). Memoized per prefix set: class bytes are
    * immutable for the JVM's lifetime.
    */
  def digestFor(extraPrefixes: Seq[String]): Option[String] =
    digestMemo.computeIfAbsent(extraPrefixes.sorted.distinct, { prefixes =>
      val all = digestPrefixes ++ prefixes
      try {
        val root = Paths.get(
          getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
        val md = MessageDigest.getInstance("SHA-256")
        if (Files.isDirectory(root)) {
          val walk = Files.walk(root)
          val classes =
            try walk.iterator().asScala
              .filter(p => Files.isRegularFile(p))
              .map(p => root.relativize(p).toString.replace('\\', '/') -> p)
              .filter { case (rel, _) =>
                rel.endsWith(".class") && all.exists(rel.startsWith)
              }
              .toSeq.sortBy(_._1)
            finally walk.close()
          classes.foreach { case (rel, p) =>
            md.update(rel.getBytes("UTF-8"))
            md.update(Files.readAllBytes(p))
          }
          Some(md.digest().take(8).map(b => f"$b%02x").mkString)
        } else if (Files.isRegularFile(root) && root.toString.endsWith(".jar")) {
          val jar = new java.util.jar.JarFile(root.toFile)
          try {
            val entries = jar.entries().asScala
              .filter(e => !e.isDirectory && e.getName.endsWith(".class") &&
                all.exists(e.getName.startsWith))
              .toSeq.sortBy(_.getName)
            entries.foreach { e =>
              md.update(e.getName.getBytes("UTF-8"))
              val in = jar.getInputStream(e)
              try md.update(in.readAllBytes()) finally in.close()
            }
            Some(md.digest().take(8).map(b => f"$b%02x").mkString)
          } finally jar.close()
        } else None
      } catch { case _: Throwable => None }
    })

  private def san(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == '.' || c == '-') c else '_')

  /** CWD-relative by default (the repo's gitignored target/ when launched
    * by sbt from the repo root); override with SPARK_GRAFT_CACHE_DIR for
    * JVMs launched elsewhere — a wrong CWD only costs reuse (fresh cache
    * tree there), never correctness.
    */
  private def cacheRoot: Path =
    Paths.get(sys.env.getOrElse("SPARK_GRAFT_CACHE_DIR", "target/whcache"))

  /** Return the directory holding the `kind` artifact for `dataDir` +
    * `spec`, building it with `build(targetDir)` on a miss. `build`
    * receives a non-existent path and must leave the finished artifact
    * there; publication is one atomic rename. `extraPrefixes` adds
    * class-file prefixes beyond the warehouse baseline to the digest —
    * REQUIRED when the artifact's content is computed by classes outside
    * [[digestPrefixes]], or a code change there would serve stale data.
    */
  def dir(kind: String, dataDir: String, spec: String,
      extraPrefixes: Seq[String] = Nil)(
      build: String => Unit): String = digestFor(extraPrefixes) match {
    case None =>
      val tmp = Files.createTempDirectory(s"graft_$kind").resolve("artifact")
      build(tmp.toString)
      tmp.toString
    case Some(dig) =>
      val stem = s"$kind-${san(dataDir)}-${san(spec)}"
      val dst = cacheRoot.resolve(s"$stem-$dig")
      if (Files.exists(dst)) {
        // refresh the artifact's mtime on every hit: the superseded-digest
        // prune below uses age as its "no JVM can still be reading this"
        // proof, and a long-running JVM that adopted this artifact hours
        // ago keeps it fresh through its reads (a newer-code JVM building
        // the same (kind, dataDir, spec) must not delete it mid-read)
        try Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
        catch { case _: Throwable => () }
        dst.toString
      } else {
        Files.createDirectories(cacheRoot)
        // Prune (a) half-builds of this artifact whose owning process is
        // dead — a LIVE concurrent builder's dir must not be deleted from
        // under its in-progress write — and (b) superseded-digest
        // publications of EXACTLY this artifact (full stem + 16-hex tail,
        // so a spec that extends another spec's name never matches) that
        // are also old enough that no still-running JVM can be reading
        // them (the age guard: a reader's JVM and the artifact it built
        // are younger than this bound).
        // 48 h: the adoption-time mtime touch above keeps ACTIVE readers'
        // artifacts fresh only at adoption, so the bound must exceed the
        // longest plausible single-JVM run BY A WIDE MARGIN — below it, a
        // newer-code JVM could delete an artifact a live reader adopted
        // hours earlier, and the reader's lazy lineage (Frames.sharedParquet
        // frames point at this dir) would then FileNotFound instead of
        // recompute. A full bench round is ~6 h wall; 48 h buys 8× that
        // at the cost of superseded dirs lingering two extra days.
        val minStaleMs = 48L * 3600 * 1000
        val now = System.currentTimeMillis()
        val ls = Files.list(cacheRoot)
        try ls.iterator().asScala
          .filter { p =>
            val n = p.getFileName.toString
            if (n.startsWith(s".build_$stem-")) {
              val pid = n.substring(n.lastIndexOf('-') + 1)
              pid.nonEmpty && pid.forall(_.isDigit) &&
                ProcessHandle.of(pid.toLong).map[Boolean](!_.isAlive).orElse(true)
            } else {
              val tail = n.stripPrefix(s"$stem-")
              n.startsWith(s"$stem-") && p != dst &&
                tail.length == 16 && tail.forall(c => c.isDigit || ('a' to 'f').contains(c)) &&
                (try now - Files.getLastModifiedTime(p).toMillis > minStaleMs
                 catch { case _: Throwable => false })
            }
          }
          .foreach(p => try deleteRecursively(p) catch { case _: Throwable => () })
        finally ls.close()
        val tmp = cacheRoot.resolve(
          s".build_$stem-$dig-${ProcessHandle.current().pid()}")
        deleteRecursively(tmp)
        build(tmp.toString)
        try Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: Throwable if Files.exists(dst) =>
            // lost a race to a concurrent builder: adopt its artifact
            deleteRecursively(tmp)
        }
        dst.toString
      }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
}
