package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.streaming.OutputMode

/** [[ManifestTable]] as a STRUCTURED STREAMING SINK
  * (`writeStream.format("graft-manifest")`): every micro-batch lands
  * as one transactional table commit — upsert by `key` (the default;
  * [[ManifestTable.merge]]), blind append (`sinkMode=append`), or a
  * full snapshot per batch (OutputMode.Complete) — behind the same
  * atomic pointer swap every reader and the CDC source already
  * observe. Together with `graft-manifest-cdc` this closes the
  * lake-to-lake loop: commit to table A, `readStream` its changes,
  * transform, `writeStream` into table B — an incremental derived
  * table with offsets in the sink checkpoint and no hand-rolled
  * version bookkeeping.
  *
  * Delivery contract, stated honestly:
  *  - Replayed micro-batches (failure between sink commit and
  *    checkpoint write) are SKIPPED via a per-query transaction marker
  *    (`_stream_txn-<id>`, keyed by a hash of the checkpoint
  *    location so it survives restarts) — the Delta `txnVersion`
  *    idempotence shape.
  *  - The marker is written AFTER the table commit; a crash exactly
  *    between the two re-runs that one batch. Under merge-by-key the
  *    re-run is IDEMPOTENT (same keys, same images ⇒ same table), so
  *    the end-to-end result is exactly-once; under `sinkMode=append`
  *    that window is at-least-once — use append only for
  *    replay-tolerant feeds.
  */
class ManifestStreamSink(root: String, key: Seq[String],
    outputMode: OutputMode, txnId: String, appendOnly: Boolean) extends Sink {

  private def txnPath = Paths.get(root, s"_stream_txn-$txnId")

  /** Last batch id committed by THIS query lineage; -1 when none (a
    * torn marker write reads as "replay needed", never as data loss —
    * the replay is then skipped-or-idempotent per the class contract). */
  private[sources] def lastCommitted: Long =
    if (!Files.exists(txnPath)) -1L
    else scala.util.Try(Files.readString(txnPath).trim.toLong).getOrElse(-1L)

  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = synchronized {
    if (batchId <= lastCommitted) return // replay of an already-landed batch
    val batch = org.apache.spark.sql.graft.SqlShims.asBatchFrame(
      data.asInstanceOf[org.apache.spark.sql.classic.DataFrame])
    if (outputMode == OutputMode.Complete()) ManifestTable.commitSnapshot(batch, root, Nil)
    else if (appendOnly) ManifestTable.append(batch, root)
    else ManifestTable.merge(batch, root, key)
    // marker AFTER the commit (crash between = one idempotent re-run);
    // temp+move so a torn write can only look like a missing marker
    val tmp = Files.createTempFile(Paths.get(root), "_txn", ".tmp")
    Files.writeString(tmp, batchId.toString)
    Files.move(tmp, txnPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  override def toString: String =
    s"ManifestStreamSink[$root, ${if (appendOnly) "append" else s"merge key=$key"}]"
}

object ManifestStreamSink {
  /** Build from `writeStream` options (shared by the provider and
    * specs): `path` required; `key` required unless `sinkMode=append`
    * or Complete mode; txn id derives from the checkpoint location so
    * a restarted query keeps its replay-skip lineage. */
  private[graft] def fromOptions(parameters: Map[String, String],
      outputMode: OutputMode, root: String): ManifestStreamSink = {
    val appendOnly = parameters.get("sinkMode") match {
      case None | Some("merge") => false
      case Some("append") => true
      case Some(other) => throw new IllegalArgumentException(
        s"graft-manifest sink: unknown sinkMode '$other' (merge|append)")
    }
    val key = parameters.get("key")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    require(appendOnly || outputMode == OutputMode.Complete() || key.nonEmpty,
      "graft-manifest sink: option 'key' (merge key) is required unless " +
        "sinkMode=append or outputMode is Complete")
    val txnId = parameters.get("checkpointLocation")
      .map(p => digest(canonicalCheckpoint(p)))
      .getOrElse(java.util.UUID.randomUUID().toString.take(16))
    new ManifestStreamSink(root, key, outputMode, txnId, appendOnly)
  }

  /** One marker lineage per checkpoint regardless of how a restart
    * SPELLS the path (ADVICE r10): relative vs absolute, trailing
    * slash, and `file:`-qualified URIs all canonicalize to the same
    * absolute plain path, so a restarted query keeps its replay-skip
    * watermark instead of silently starting a fresh lineage. */
  private[graft] def canonicalCheckpoint(p: String): String = {
    val plain =
      if (p.startsWith("file:")) new org.apache.hadoop.fs.Path(p).toUri.getPath
      else if (p.contains("://")) return p.stripSuffix("/") // non-local store
      else p
    Paths.get(plain).toAbsolutePath.normalize.toString.stripSuffix("/")
  }

  /** SHA-256 hex prefix (16 chars = 64 bits) — collision-safe across
    * queries sharing a table, unlike 32-bit `hashCode` (ADVICE r10). */
  private[graft] def digest(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString

  /** THE turnkey maintenance shell every index family shares (the
    * round-18 consolidation's streaming face): a `graft-manifest-cdc`
    * read of `corpusRoot` (preimages on, offsets in `checkpoint`)
    * driving `apply(batch, batchId, scope)` per micro-batch, where
    * scope = the checkpoint's digest — this stream's identity in the
    * txn-tag space, so two streams sharing an index table cannot alias
    * each other's replay watermarks. `apply` is each family's
    * exactly-once applyBatch (single-table for [[MaintainedIndex]]
    * fronts, multi-table for [[DedupIndex]]/[[ClusterIndex]]/
    * [[EntityIndex]]). Pair a snapshot bootstrap with
    * `startingVersion`, or the re-emitted snapshot batch
    * double-applies (the non-idempotent ref-counts corrupt; the
    * idempotent merges pay a full recompute). */
  private[graft] def turnkeyMaintenance(
      spark: org.apache.spark.sql.SparkSession, corpusRoot: String,
      key: String, checkpoint: String, startingVersion: Int)(
      apply: (org.apache.spark.sql.DataFrame, Long, String) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val scope = digest(canonicalCheckpoint(checkpoint))
    spark.readStream.format("graft-manifest-cdc")
      .option("path", corpusRoot).option("key", key)
      .option("startingVersion", startingVersion.toString)
      .option("preimages", "true").load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        apply(b, id, scope)
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
