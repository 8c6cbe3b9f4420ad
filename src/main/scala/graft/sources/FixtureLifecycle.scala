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
    * not poison probes) and `build(root)` runs fresh.
    *
    * Probe + wipe + build run under a CROSS-PROCESS file lock (a
    * sibling `.lock` file, `FileChannel.lock`): `synchronized` only
    * serializes threads of one JVM, and forked test JVMs share
    * java.io.tmpdir — without the lock one JVM could wipe/rebuild the
    * root while another's completeness probe or reads were in flight.
    * A reader past its (locked) probe is safe: a concurrent entrant
    * re-probes under the lock, finds the fixture complete, and never
    * wipes. The JVM-level `synchronized` stays, both as the fast path
    * and because overlapping `FileChannel.lock` calls from one JVM
    * throw rather than queue. */
  def ensureOnce(prefix: String, sig: String)(complete: String => Boolean)(
      build: String => Unit): String = synchronized {
    val root = Paths.get(sys.props("java.io.tmpdir"), s"${prefix}_$sig").toString
    if (!builtInJvm.contains(root)) {
      import java.nio.file.StandardOpenOption.{CREATE, WRITE}
      val ch = java.nio.channels.FileChannel.open(Paths.get(s"$root.lock"), CREATE, WRITE)
      try {
        val lock = ch.lock() // blocks until any other process's build finishes
        try {
          if (!complete(root)) {
            deleteRecursively(Paths.get(root))
            build(root)
          }
        } finally lock.release()
      } finally ch.close()
      builtInJvm += root
    }
    root
  }
}
