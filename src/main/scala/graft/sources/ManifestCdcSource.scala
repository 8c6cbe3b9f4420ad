package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructType}

/** [[ManifestTable]] as a STRUCTURED STREAMING SOURCE — the Delta
  * `readStream` shape: every committed version is a micro-batch of
  * row-level change events.
  *
  * {{{
  * spark.readStream.format("graft-manifest-cdc")
  *   .option("path", root).option("key", "id")
  *   .load()                         // table columns + _change_type
  * }}}
  *
  * The OFFSET IS THE TABLE VERSION: `getOffset` reports the current
  * committed version (an atomic pointer read — O(1) regardless of
  * table size), and `getBatch(from, to)` is exactly
  * [[ManifestTable.readChanges]] `(from → to)` — manifest-level
  * partition pruning first, then one key-partitioned join over only
  * the CHANGED slices. A quiet table costs the poll nothing; a
  * one-day upsert on a 10k-partition table streams two
  * single-partition diffs, never a snapshot scan. Offsets live in the
  * sink's checkpoint, so a restarted stream resumes from the last
  * processed VERSION — replayable because manifests are immutable
  * (until [[ManifestTable.vacuum]] ages them out; a resume past a
  * vacuumed version fails loudly rather than silently skipping).
  *
  * Options: `key` (required — the merge key readChanges pairs rows
  * by), `startingVersion` (default 0 = bootstrap: first batch emits
  * the whole starting snapshot as inserts; N = changes after version
  * N only), `preimages` (default false; true adds `update_preimage`
  * events, the full Delta-CDF set an incremental-view consumer
  * needs).
  *
  * This is the missing face of the maintained-index story
  * ([[DedupIndex]]/[[VecIndex]] consume CDC by POLLING readChanges;
  * a downstream team would rather `readStream`): commit to the lake
  * table, and every dependent — index maintenance, incremental
  * aggregate, audit sink — follows as a streaming query with
  * exactly-once offsets instead of hand-rolled version bookkeeping.
  */
class ManifestCdcSource(sqlContext: SQLContext, root: String,
    key: Seq[String], startingVersion: Int, preimages: Boolean,
    override val schema: StructType) extends Source {

  private def current: Int = ManifestTable.currentVersion(root)

  override def getOffset: Option[Offset] = {
    val v = current
    if (v >= 1) Some(LongOffset(v.toLong)) else None
  }

  /** Restart hands back a SerializedOffset (raw checkpoint JSON), a
    * live run a LongOffset — both carry the version as a long. */
  private def ver(o: Offset): Int = o match {
    case l: LongOffset => l.offset.toInt
    case other => other.json.trim.toInt
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(ver).getOrElse(startingVersion)
    val toV = ver(end)
    val changes =
      if (toV <= fromV) // rescaled/no-op batch: empty frame in source shape
        ManifestTable.readChanges(sqlContext.sparkSession, root,
          toV max 1, toV max 1, key, preimages).limit(0)
      else
        ManifestTable.readChanges(sqlContext.sparkSession, root,
          fromV, toV, key, preimages)
    // conform to the declared source schema (a later add-column commit
    // widens readChanges' frame mid-stream; the STREAM's contract is the
    // schema it started with — Delta does the same — so select exactly
    // those columns, null-filling any the batch predates)
    val cols = schema.fieldNames.map { c =>
      if (changes.columns.contains(c)) org.apache.spark.sql.functions.col(c)
      else lit(null).cast(schema(c).dataType).as(c)
    }
    org.apache.spark.sql.graft.SqlShims.asStreamingFrame(
      changes.select(cols.toIndexedSeq: _*)
        .asInstanceOf[org.apache.spark.sql.classic.DataFrame])
  }

  override def stop(): Unit = ()

  override def toString: String = s"ManifestCdcSource[$root, key=$key]"
}

/** `readStream.format("graft-manifest-cdc")` registration. */
class ManifestCdcSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-manifest-cdc"

  private def parse(parameters: Map[String, String]): (String, Seq[String], Int, Boolean) = {
    val raw = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-manifest-cdc: option 'path' (table root) is required"))
    val uri = new org.apache.hadoop.fs.Path(raw).toUri
    val root =
      if (uri.getScheme == null || uri.getScheme == "file") uri.getPath
      else throw new IllegalArgumentException(
        s"graft-manifest-cdc: only local filesystem roots are supported, got $raw")
    val key = parameters.getOrElse("key", throw new IllegalArgumentException(
      "graft-manifest-cdc: option 'key' (comma-separated merge key) is required"))
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    require(key.nonEmpty, "graft-manifest-cdc: option 'key' names no columns")
    (root, key,
      parameters.get("startingVersion").map(_.toInt).getOrElse(0),
      parameters.get("preimages").exists(_.toBoolean))
  }

  /** Source schema = current snapshot's columns + `_change_type`,
    * fixed for the stream's lifetime. */
  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val (root, _, _, _) = parse(parameters)
    val cur = ManifestTable.currentVersion(root)
    require(cur >= 1, s"graft-manifest-cdc: no committed version at $root " +
      "(commit v1 before starting the stream)")
    val base = ManifestTable.read(sqlContext.sparkSession, root).schema
    (shortName(), base.add("_change_type", StringType, nullable = false))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (root, key, startingVersion, preimages) = parse(parameters)
    val srcSchema = schema.getOrElse(
      sourceSchema(sqlContext, None, providerName, parameters)._2)
    new ManifestCdcSource(sqlContext, root, key, startingVersion, preimages, srcSchema)
  }
}
