package graft.sources

import java.nio.file.{Files, Path, Paths}

/** Build-once fixture lifecycle shared by the maintained-table oracle
  * fixtures ([[DedupIndexFixtures]], [[DiffFixtures]]): one on-disk
  * build per content SIGNATURE under java.io.tmpdir, reused across JVMs
  * running the same code, wiped and rebuilt when the signature changes
  * or a completeness probe finds half-built leftovers. Extracted so a
  * fix to the lifecycle (the leftover wipe, the signature scheme) lands
  * once instead of drifting across copies. */
private[sources] object FixtureLifecycle {

  private val builtInJvm = scala.collection.mutable.Set[String]()

  /** 8-byte hex digest over the parts that define the fixture's
    * CONTENT — sfDir, a layout version, and any hashing/banding
    * definitions the build bakes in, so a code change that alters them
    * invalidates stale on-disk fixtures instead of silently probing
    * data built by older code. */
  def signature(parts: Seq[String]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.mkString("|").getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }

  /** The root for `prefix`+`sig`, built at most once per JVM:
    * `complete(root)` decides whether an on-disk leftover from a prior
    * run is reusable; anything else is wiped (half-built leftovers must
    * not poison probes) and `build(root)` runs fresh. */
  def ensureOnce(prefix: String, sig: String)(complete: String => Boolean)(
      build: String => Unit): String = synchronized {
    val root = Paths.get(sys.props("java.io.tmpdir"), s"${prefix}_$sig").toString
    if (!builtInJvm.contains(root)) {
      if (!complete(root)) {
        deleteRecursively(Paths.get(root))
        build(root)
      }
      builtInJvm += root
    }
    root
  }
}
