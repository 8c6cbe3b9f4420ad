package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
import org.apache.spark.sql.functions.{array, col, collect_set, explode, hash, input_file_name, lit, pmod, regexp_extract}

/** Per-file BLOOM SIDECARS for point-lookup file skipping — the
  * Delta/Iceberg bloom-index shape, covering exactly the case min/max
  * stats cannot: an EqualTo on a high-cardinality column over an
  * UNCLUSTERED layout (every file's [min, max] spans the whole domain,
  * so range stats keep everything; a per-file bloom keeps only the
  * file(s) that actually contain the key, and a miss keeps ~none).
  *
  * Layout: a table declares its bloom column in `root/_bloom`
  * (sticky, like the stats header); every snapshot/append commit then
  * writes `root/<rel>.bloom` next to each data file — `m` bits set at
  * `k` positions per distinct value. The bit positions are computed
  * IN THE SCAN with Spark's own codegen `hash()` (Murmur3, seed 42)
  * and aggregated per file as a `collect_set` — at most `m` distinct
  * positions cross to the driver per file, BOUNDED BY CONSTRUCTION
  * regardless of row count. The read side re-derives the probe
  * positions on the driver by evaluating the SAME Catalyst
  * `Murmur3Hash` expression over the filter's literal — one hash
  * implementation, zero cross-engine drift.
  *
  * Guarantees: pruning is conservative (a file without a sidecar —
  * older generation, undeclared — is always read; bloom false
  * positives only ADD files), and Spark re-applies the predicate
  * row-level, so answers are exact. False-negative-freedom is the
  * bloom invariant: every inserted value sets all its k bits, so a
  * file containing the key is NEVER skipped.
  *
  * At 100 TB: a needle-in-the-lake lookup (`WHERE doc_id = x`) on
  * append-ordered ingest touches the one batch file holding the key —
  * metadata decides from `n_files × m/8` bytes of sidecar, no data
  * I/O for the misses. Sizing: m=8192/k=4 give ~1.2% false-positive
  * rate at ~1.4k distinct values per file (n/m = 0.17); the rate
  * degrades gracefully (more files read, never wrong) as files grow
  * denser.
  */
object ManifestBloom {
  val M: Int = 8192 // bits per file sidecar (1 KiB)
  val K: Int = 4    // hash functions

  private def declPath(root: String) = Paths.get(root, "_bloom")

  /** The declared bloom column, if any (sticky across commits). */
  def bloomColumn(root: String): Option[String] =
    if (Files.exists(declPath(root))) {
      val s = Files.readString(declPath(root)).trim
      if (s.nonEmpty) Some(s) else None
    } else None

  /** Declare (or re-declare) the bloom column. Sidecar files are NAMED
    * by the column they encode (`<rel>.<col>.bloom`, ADVICE r10), so a
    * re-declaration cannot silently mis-probe: files whose sidecars were
    * built from the OLD column simply have no sidecar under the new
    * name and are conservatively read until a later commit rewrites
    * them. The declaration file itself lands via temp + ATOMIC_MOVE so
    * a torn write can never leave a half-written column name. */
  def declare(root: String, column: String): Unit = {
    require(column.nonEmpty && !column.contains('.') &&
        !column.contains('/') && !column.contains('\n'),
      s"bloom column '$column' must be non-empty without '.', '/' or newline " +
        "(it becomes part of the sidecar file name)")
    Files.createDirectories(Paths.get(root))
    val tmp = Files.createTempFile(Paths.get(root), "_bloom", ".tmp")
    Files.writeString(tmp, column)
    Files.move(tmp, declPath(root), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** The sidecar path for one data file + column — the column name in
    * the FILE NAME is what pins a sidecar to the hashes it encodes. */
  private[graft] def sidecarRel(rel: String, column: String): String =
    s"$rel.$column.bloom"

  /** The k bit positions for one column value, as scan-side codegen
    * columns — `pmod(hash(value, seed_i), m)`. */
  private def positionCols(c: Column): Seq[Column] =
    (0 until K).map(i => pmod(hash(c, lit(i)), lit(M)))

  /** The same k positions for a FILTER literal, evaluated on the driver
    * through the identical Catalyst expression (`hash()` IS
    * Murmur3Hash(seed 42)); `l` keeps the filter's own type, so
    * commit-side and probe-side hash the same bytes. */
  private[sources] def probePositions(l: Literal): Seq[Int] =
    (0 until K).map { i =>
      val h = new Murmur3Hash(Seq(l, Literal(i)), 42)
        .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        .asInstanceOf[Int]
      ((h % M) + M) % M
    }

  /** Hard cap on files per sidecar-writing commit: the driver holds at
    * most `M` bit positions per file (`collect_set` bound), so memory is
    * `entries × M × 4 B` worst-case — 512 MiB at this cap. A commit
    * listing more files than this should be split (or bloom skipping
    * dropped for it); failing loudly beats an silent driver OOM. */
  val MaxSidecarFilesPerCommit: Int = 16384

  /** Write one sidecar per freshly committed file entry (files listed
    * relative to `root`). One distributed job; per file at most M
    * positions reach the driver, and the commit-wide driver
    * materialization is capped by [[MaxSidecarFilesPerCommit]]. */
  private[graft] def writeSidecars(spark: SparkSession, root: String,
      entries: Seq[ManifestTable.FileEntry], column: String): Unit = {
    if (entries.isEmpty) return
    require(entries.size <= MaxSidecarFilesPerCommit,
      s"bloom sidecar write for ${entries.size} files exceeds the " +
        s"$MaxSidecarFilesPerCommit-file cap (driver holds up to M=$M positions " +
        "per file): split the commit or undeclare the bloom column for bulk loads")
    val df = spark.read.parquet(entries.map(e => s"$root/${e.rel}"): _*)
    if (!df.columns.contains(column)) return // evolved-away column: no sidecars
    val byFile = df
      .select(regexp_extract(input_file_name(), "[^/]+$", 0).as("__f"),
        explode(array(positionCols(col(column)): _*)).as("pos"))
      .groupBy(col("__f")).agg(collect_set(col("pos")).as("ps"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    entries.foreach { e =>
      val name = e.rel.substring(e.rel.lastIndexOf('/') + 1)
      byFile.get(name).foreach { ps =>
        val bits = new java.util.BitSet(M)
        ps.foreach(bits.set)
        Files.write(Paths.get(root, sidecarRel(e.rel, column)), bits.toByteArray)
      }
    }
  }

  /** Membership probe against a file's sidecar FOR `column`: `None`
    * when no sidecar encoding that column exists (caller must keep the
    * file — covers both "never written" and "written for a previously
    * declared column", the ADVICE r10 false-negative hazard), otherwise
    * whether ALL k bits for the literal are set (false ⇒ the key is
    * definitely absent). */
  private[graft] def mightContain(root: String, rel: String, column: String,
      l: Literal): Option[Boolean] = {
    val p = Paths.get(root, sidecarRel(rel, column))
    if (!Files.exists(p)) None
    else {
      val bits = java.util.BitSet.valueOf(Files.readAllBytes(p))
      Some(probePositions(l).forall(bits.get))
    }
  }
}
