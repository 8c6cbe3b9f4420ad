package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger}
import org.apache.spark.sql.{Encoders, Row}

/** Per-user running state for mapGroupsWithState. */
case class UserStats(user_id: Long, n_events: Long, total_value: Double, last_seen_epoch: Long)

/** Structured Streaming surface (SURVEY §2.10): the reference's
  * incremental-sync contract ("only updates changed or new entries",
  * reference README:48; batch re-scan + fingerprint upsert,
  * main.py:140-165) as a true micro-batch pipeline, plus tumbling-window
  * aggregation with watermarking for the `events` stream shape.
  *
  * Scale notes: state for the windowed agg is bounded by the watermark;
  * dropDuplicatesWithinWatermark bounds dedup state the same way. The
  * foreachBatch merge touches only the partitions present in the batch —
  * dynamic partition overwrite, never a full-table rewrite.
  */
object EventStream {

  /** Tumbling 1-hour windowed aggregation with a 2-hour watermark — the
    * streaming twin of TimeSeries.q23TumblingWindow (same grouping
    * expression, same results once windows close). */
  def windowedAgg(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("total_value"))
      .select($"w.start".as("window_start"), $"event_type", $"n_events", $"total_value")
  }

  /** Streaming sessionization: per-user sessions with a 30-minute
    * inactivity gap via `session_window` — the streaming twin of
    * TimeSeries.q48SessionWindow (same grouping expression). Sessions
    * MERGE across micro-batches while events keep arriving inside the
    * gap, and a session row is emitted once the watermark passes its
    * close; state per key is one open session, bounded by the watermark
    * — no per-event state accumulates. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window($"ts", gap).as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("session_value"))
      .select($"user_id", $"w.start".as("session_start"),
        $"n_events", $"session_value")
  }

  /** Streaming D1: exactly-once-ish dedup on the event identity key with
    * state bounded by the watermark (the streaming form of
    * dropDuplicates, SURVEY §2.3 D1). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming near-dup document dedup — the streaming twin of the batch
    * text-dedup chain (q28/q29): the q29 content fingerprint (md5 of the
    * whitespace-normalized lowercase text, 16 hex chars) computed per
    * row, then `dropDuplicatesWithinWatermark` on it. A re-ingested or
    * boilerplate-identical document arriving in a LATER micro-batch is
    * suppressed as long as it lands inside the watermark, and the dedup
    * state for a fingerprint is dropped once the watermark passes it —
    * state stays bounded by (watermark window × ingest rate), never by
    * corpus size. Expects columns (doc_id, ts, text). */
  def dedupDocStream(docs: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .withColumn("fingerprint",
        substring(md5(regexp_replace(lower(trim($"text")), "\\s+", " ")), 1, 16))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
  }

  /** [[dedupDocStream]] composed onto the transactional sink: deduped
    * docs MERGE into a manifest-committed table keyed by fingerprint —
    * re-delivery converges and commits stay atomic. */
  def dedupDocSink(docs: DataFrame, tableRoot: String, watermark: String = "2 hours")
      : DataStreamWriter[Row] =
    dedupDocStream(docs, watermark).writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.ManifestTable.merge(batch, tableRoot, Seq("fingerprint")): Unit
      }

  /** D2 as foreachBatch: each micro-batch MERGEs into the parquet silver
    * table at `sinkPath` (keyed on `key`), giving idempotent upsert
    * semantics — re-delivery of a batch converges to the same table
    * (main.py:164-165's "second run is a no-op"). */
  def upsertSink(incoming: DataFrame, sinkPath: String, key: Seq[String])
      : DataStreamWriter[Row] =
    incoming.writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeIntoParquet(batch, sinkPath, key)
      }

  /** D2 against the TRANSACTIONAL sink: each micro-batch merges into a
    * manifest-committed table ([[graft.sources.ManifestTable]]) — commit
    * is an atomic pointer swap, concurrent readers keep their snapshot,
    * and a crashed batch leaves only unreferenced garbage. This is the
    * production form of [[upsertSink]]'s raw-parquet swap. */
  def upsertSinkTransactional(incoming: DataFrame, tableRoot: String, key: Seq[String])
      : DataStreamWriter[Row] =
    incoming.writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.ManifestTable.merge(batch, tableRoot, key): Unit
      }

  /** Both at once — transactional AND partition-scoped: each micro-batch
    * runs [[graft.sources.ManifestTable.mergePartitioned]], which rewrites
    * only the batch's partitions and commits via the atomic pointer swap.
    * O(touched partitions) write amplification with snapshot isolation —
    * the production form of the per-day upsert contract
    * (calorista/main.py:146-161). `key` must contain `partCol`. */
  def upsertSinkTransactionalPartitioned(
      incoming: DataFrame, tableRoot: String, key: Seq[String], partCol: String)
      : DataStreamWriter[Row] =
    incoming.writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.ManifestTable.mergePartitioned(batch, tableRoot, key, partCol): Unit
      }

  /** Partition-scoped MERGE for a date-partitioned silver table: only
    * the partitions present in the batch are read, merged, and
    * dynamically overwritten — the whole-table path below never runs.
    * The partition list is collected to the driver (bounded: distinct
    * partition values of ONE batch, not data). This is the 100 TB form
    * of the reference's per-day read-modify-write (main.py:137-161). */
  def mergePartitioned(
      batch: DataFrame, sinkPath: String, key: Seq[String], partCol: String): Unit = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.functions.col
    if (!new java.io.File(sinkPath).exists()) {
      batch.write.partitionBy(partCol).parquet(sinkPath)
      return
    }
    val parts = batch.select(partCol).distinct().collect().map(_.get(0))
    val existing = spark.read.parquet(sinkPath)
      .where(col(partCol).isin(parts.toSeq: _*))
      .select(batch.columns.map(col).toSeq: _*) // align column order
    val merged = Dedup.merge(existing, batch, key)
    merged.write
      .partitionBy(partCol)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(sinkPath)
  }

  /** One MERGE step: read current sink state, merge (incoming wins),
    * rewrite. On a transactional table format this is MERGE INTO; on raw
    * parquet we stage-then-swap with a CHECKED commit protocol:
    * every rename result is verified (File.renameTo reports failure by
    * return value — e.g. cross-filesystem moves), a failed target swap
    * rolls the previous table back, and an interrupted swap from a
    * crashed run is repaired on the next call (the `.old` copy is
    * restored if the target vanished mid-swap). The invariant: a reader
    * never observes a HALF-WRITTEN table, and a failure surfaces as an
    * exception instead of silent data loss. Honest limit: between the
    * two renames of the swap there is a window where the target path
    * does not exist — a concurrent reader can get a transient
    * file-not-found. [[graft.sources.ManifestTable]] is the
    * reader-ATOMIC variant (pointer swap, snapshot isolation); prefer
    * it, or [[mergePartitioned]] for partition-scoped raw parquet. */
  def mergeIntoParquet(batch: DataFrame, sinkPath: String, key: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val target = new java.io.File(sinkPath)
    val old = new java.io.File(sinkPath + ".old")
    val staged = new java.io.File(sinkPath + ".staging")
    // crash recovery: a previous run renamed target -> .old and died
    // before promoting its staging copy — restore the last committed
    // table before merging into it
    if (!target.exists() && old.exists())
      renameOrThrow(old, target, "recovering interrupted swap")
    deleteRecursively(staged) // incomplete write from a crashed run
    val merged =
      if (target.exists()) Dedup.merge(spark.read.parquet(sinkPath), batch, key)
      else batch
    merged.write.mode("overwrite").parquet(staged.getPath)
    // swap: parquet has no MERGE transaction; staging keeps readers from
    // observing a half-written table
    if (target.exists()) {
      deleteRecursively(old)
      renameOrThrow(target, old, "parking current table")
    }
    try renameOrThrow(staged, target, "promoting staged table")
    catch { case e: java.io.IOException =>
      // roll back so readers keep the previous committed table
      if (old.exists() && !old.renameTo(target))
        throw new java.io.IOException(
          s"merge sink left without a committed table at $sinkPath " +
            s"(promote AND rollback both failed); manual repair from $old", e)
      throw e
    }
    deleteRecursively(old)
  }

  private def renameOrThrow(from: java.io.File, to: java.io.File, what: String): Unit =
    if (!from.renameTo(to))
      throw new java.io.IOException(
        s"$what: rename $from -> $to failed (cross-filesystem move, " +
          "permissions, or concurrent writer)")

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    if (f.exists()) f.delete()
  }

  /** Custom per-key state (§2.10 / the build brief's
    * mapGroupsWithState surface): running per-user counters — events
    * seen, total value, last-seen timestamp — maintained as typed state
    * across micro-batches. State is per user_id; at scale the state
    * store shards with the shuffle partitioning. */
  def runningUserStats(events: DataFrame): Dataset[UserStats] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .selectExpr("user_id", "ts", "value")
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        case (userId, rows, state) =>
          val prev = state.getOption.getOrElse(UserStats(userId, 0L, 0.0, 0L))
          var n = prev.n_events
          var total = prev.total_value
          var lastTs = prev.last_seen_epoch
          rows.foreach { case (_, ts, v) =>
            n += 1
            total += v
            lastTs = math.max(lastTs, ts.getTime)
          }
          val next = UserStats(userId, n, total, lastTs)
          state.update(next)
          next
      }
  }

  /** The same running stats on Spark 4's `transformWithState` — the
    * successor of mapGroupsWithState (typed state handles with explicit
    * lifecycle + TTL; requires the RocksDB state store provider). Kept
    * alongside [[runningUserStats]] so StreamingSpec can assert the two
    * state APIs produce identical results. At scale the TTL handle is
    * the operational win: per-key state can expire without a custom
    * timeout dance. */
  class UserStatsProcessor
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp, Double), UserStats] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[UserStats] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserStats](
        "stats", Encoders.product[UserStats], TTLConfig.NONE)
    override def handleInputRows(
        userId: Long,
        rows: Iterator[(Long, java.sql.Timestamp, Double)],
        timerValues: TimerValues): Iterator[UserStats] = {
      val prev = if (state.exists()) state.get() else UserStats(userId, 0L, 0.0, 0L)
      var n = prev.n_events
      var total = prev.total_value
      var lastTs = prev.last_seen_epoch
      rows.foreach { case (_, ts, v) =>
        n += 1
        total += v
        lastTs = math.max(lastTs, ts.getTime)
      }
      val next = UserStats(userId, n, total, lastTs)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** [[runningUserStats]] re-expressed on the transformWithState API. */
  def runningUserStatsTws(events: DataFrame): Dataset[UserStats] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .selectExpr("user_id", "ts", "value")
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .transformWithState(new UserStatsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** A session closed by inactivity timeout (emitted by timer expiry,
    * not by data arrival — the piece watermarked session WINDOWS can't
    * express, since those only close when later data raises the
    * watermark). */
  case class ClosedSession(
      user_id: Long, n_events: Long, total_value: Double, closed_at_epoch: Long)

  /** Timer-driven session timeout on transformWithState: each input
    * batch slides the user's processing-time timer to now+gap; if no
    * further events arrive the timer FIRES and the closed session is
    * emitted and its state cleared. This is the timer half of the
    * transformWithState API ([[UserStatsProcessor]] covers value-state +
    * TTL): output is produced by the absence of data — a contract
    * `session_window` (q48's shape) cannot provide, because a quiet key
    * there stays open until some OTHER event advances the watermark.
    * State per key is one (n, total) pair + one registered timer —
    * bounded, RocksDB-backed, cleared on close. */
  class SessionTimeoutProcessor(gapMs: Long)
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp, Double), ClosedSession] {
    @transient private var agg: org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _
    @transient private var timer: org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      agg = getHandle.getValueState[(Long, Double)](
        "agg", Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)
      timer = getHandle.getValueState[Long]("timer", Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(
        userId: Long,
        rows: Iterator[(Long, java.sql.Timestamp, Double)],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val (n0, v0) = if (agg.exists()) agg.get() else (0L, 0.0)
      var n = n0; var total = v0
      rows.foreach { case (_, _, v) => n += 1; total += v }
      agg.update((n, total))
      if (timer.exists()) getHandle.deleteTimer(timer.get())
      val expiry = timerValues.getCurrentProcessingTimeInMs() + gapMs
      getHandle.registerTimer(expiry)
      timer.update(expiry)
      Iterator.empty
    }
    override def handleExpiredTimer(
        userId: Long,
        timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[ClosedSession] = {
      val (n, total) = if (agg.exists()) agg.get() else (0L, 0.0)
      agg.clear()
      timer.clear()
      Iterator.single(
        ClosedSession(userId, n, total, expiredTimerInfo.getExpiryTimeInMs()))
    }
  }

  /** Inactivity-closed sessions over an events stream ([[SessionTimeoutProcessor]]). */
  def sessionTimeouts(events: DataFrame, gapMs: Long): Dataset[ClosedSession] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .selectExpr("user_id", "ts", "value")
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .transformWithState(new SessionTimeoutProcessor(gapMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** One 3-step pattern occurrence on a user timeline — the unit q104
    * counts; emitted incrementally by [[TrigramProcessor]]. */
  case class TrigramHit(user_id: Long, t1: String, t2: String, t3: String)

  /** Streaming twin of q104's trigram mining on `transformWithState`:
    * per-user ordered state is just the LAST TWO event types — O(1) per
    * key regardless of timeline length — and every arriving event closes
    * exactly one new trigram. Rows within a micro-batch are sorted by
    * (ts, event_id) per key (a micro-batch's iterator has no order
    * contract); cross-batch order is the stream's delivery order, the
    * standard per-key append contract. Downstream counting is the same
    * combiner-friendly (t1,t2,t3) aggregate the batch query runs —
    * StreamingSpec proves multiset parity with
    * [[graft.operators.TimeSeries.behaviorTrigrams]]. */
  class TrigramProcessor
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp, Long, String), TrigramHit] {
    @transient private var tail: org.apache.spark.sql.streaming.ValueState[(String, String)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      tail = getHandle.getValueState[(String, String)](
        "tail", Encoders.tuple(Encoders.STRING, Encoders.STRING), TTLConfig.NONE)
    override def handleInputRows(
        userId: Long,
        rows: Iterator[(Long, java.sql.Timestamp, Long, String)],
        timerValues: TimerValues): Iterator[TrigramHit] = {
      var (p2, p1) = if (tail.exists()) tail.get() else (null: String, null: String)
      val out = Seq.newBuilder[TrigramHit]
      rows.toArray.sortBy(r => (r._2.getTime, r._3)).foreach { case (_, _, _, t) =>
        if (p2 != null) out += TrigramHit(userId, p2, p1, t)
        p2 = p1
        p1 = t
      }
      tail.update((p2, p1))
      out.result().iterator
    }
  }

  /** q104 as a stream: events in, closed trigram occurrences out. */
  def trigramStream(events: DataFrame): Dataset[TrigramHit] = {
    val s = events.sparkSession
    import s.implicits._
    events.selectExpr("user_id", "ts", "event_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new TrigramProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** One attributed purchase (q109's unit) as emitted by
    * [[LastTouchProcessor]]. */
  case class AttributedPurchase(user_id: Long, purchase_epoch: Long, touch_type: String)

  /** Streaming twin of q109's last-touch attribution: per-user state is
    * the most recent NON-purchase (type, ts) — O(1) per key. A purchase
    * credits that touch when it is within `windowMs`, else 'direct', at
    * the moment the purchase arrives — no window over the timeline, no
    * buffering. Share computation stays a downstream bounded aggregate
    * (|event_types| rows), exactly as in the batch query. */
  class LastTouchProcessor(windowMs: Long)
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp, Long, String), AttributedPurchase] {
    @transient private var lastTouch: org.apache.spark.sql.streaming.ValueState[(String, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastTouch = getHandle.getValueState[(String, Long)](
        "lastTouch", Encoders.tuple(Encoders.STRING, Encoders.scalaLong), TTLConfig.NONE)
    override def handleInputRows(
        userId: Long,
        rows: Iterator[(Long, java.sql.Timestamp, Long, String)],
        timerValues: TimerValues): Iterator[AttributedPurchase] = {
      val out = Seq.newBuilder[AttributedPurchase]
      rows.toArray.sortBy(r => (r._2.getTime, r._3)).foreach { case (_, ts, _, t) =>
        if (t == "purchase") {
          val credit =
            if (lastTouch.exists() && lastTouch.get()._2 >= ts.getTime - windowMs)
              lastTouch.get()._1
            else "direct"
          out += AttributedPurchase(userId, ts.getTime, credit)
        } else lastTouch.update((t, ts.getTime))
      }
      out.result().iterator
    }
  }

  /** q109 as a stream: events in, per-purchase last-touch credits out. */
  def attributionStream(events: DataFrame, windowMs: Long = 3600000L)
      : Dataset[AttributedPurchase] = {
    val s = events.sparkSession
    import s.implicits._
    events.selectExpr("user_id", "ts", "event_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new LastTouchProcessor(windowMs),
        TimeMode.None(), OutputMode.Append())
  }

  /** One cross-doc span overlap as emitted by [[SpanOverlapProcessor]]:
    * `doc_id` repeats a span first seen in `first_doc`. */
  case class SpanHit(doc_id: Long, span_hash: String, first_doc: Long)

  /** Streaming twin of q118's winnowed span-overlap detection: state per
    * span fingerprint is ONE long — the first document that carried it —
    * and every later document repeating the span emits a [[SpanHit]] the
    * moment it arrives. Within a micro-batch the first-seen doc is the
    * smallest doc_id (a batch iterator has no order contract; the
    * tie-break makes replays deterministic), and docs after the first
    * emit against it — so two docs sharing a span in ONE batch are
    * caught, not just cross-batch repeats. State grows with DISTINCT
    * fingerprints seen; an ingest pipeline that only cares about
    * near-in-time overlap bounds it with a TTL on the value state (the
    * [[dedupDocStream]] watermark analog) — left off here so the spec
    * can prove exact parity with the batch query's corpus-wide answer. */
  class SpanOverlapProcessor extends StatefulProcessor[String, (String, Long), SpanHit] {
    @transient private var first: org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      first = getHandle.getValueState[Long]("first", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(
        spanHash: String,
        rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[SpanHit] = {
      val docs = rows.map(_._2).toArray.distinct.sorted
      val firstDoc =
        if (first.exists()) first.get()
        else { first.update(docs.head); docs.head }
      docs.iterator.filter(_ != firstDoc).map(d => SpanHit(d, spanHash, firstDoc))
    }
  }

  /** q118 as a stream: docs (doc_id, text) in, span-repeat hits out.
    * The fingerprint step is [[graft.functions.TextOps.winnowedSpans]] —
    * the SAME expression the batch query selects with, so the two
    * surfaces cannot drift. */
  def spanOverlapStream(docs: DataFrame): Dataset[SpanHit] = {
    val s = docs.sparkSession
    import s.implicits._
    graft.functions.TextOps.winnowedSpans(docs)
      .select($"span_hash", $"doc_id").as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new SpanOverlapProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** One contaminated-span cut from [[evalSpanScrubStream]] — the same
    * (doc, interval) unit batch q150 emits. */
  case class SpanCut(doc_id: Long, span_start: Long, span_end: Long,
      span_tokens: Long)

  /** Driver-side eval-window collects are safe ONLY while the suite is
    * benchmark-sized: 16M distinct 32-char md5 windows ≈ 1.3 GB of
    * broadcast — already generous for any real eval suite, and a hard
    * wall against a misconfigured eval predicate sweeping in the corpus
    * (the q98 bloom guard's rationale, applied to spans). */
  val DefaultMaxEvalWindows: Long = 16L * 1024 * 1024

  /** q150 as a stream: docs (doc_id, text) in, contaminated-span cuts
    * out. STATELESS by design — the island merge is intra-doc (a doc's
    * window positions all live in its own row), so unlike
    * [[nearDupProbeStream]] there is no state store, no watermark and no
    * shuffle: the distinct eval window hashes are collected once behind
    * the loud [[DefaultMaxEvalWindows]] cap, broadcast, and each
    * arriving doc is scrubbed in place by a per-partition pass that
    * re-derives the SAME 8-token md5 windows the batch side hashes
    * ([[graft.functions.TextOps.spanHashesExpr]]'s definition) and
    * merges hit positions with the same touch-or-overlap rule
    * (new island iff p − prev > 8) — the spec pins stream ≡ batch q150
    * row-for-row so the two faces cannot drift. Append-mode safe, and
    * at-least-once redelivery just re-emits identical cuts. */
  def evalSpanScrubStream(docs: DataFrame, evalDocs: DataFrame,
      maxEvalWindows: Long = DefaultMaxEvalWindows): Dataset[SpanCut] = {
    val s = docs.sparkSession
    import s.implicits._
    val eval = graft.functions.TextOps.windowPositions(evalDocs)
      .select($"h").distinct().persist()
    val n = eval.count()
    require(n <= maxEvalWindows,
      s"eval span scrub: suite has $n distinct windows, exceeding $maxEvalWindows - " +
        "that is corpus-scale, not benchmark-scale (misconfigured eval frame?). " +
        "Raise maxEvalWindows only with the broadcast cost in mind.")
    val hashes = eval.as[String].collect().toSet
    eval.unpersist()
    val bc = s.sparkContext.broadcast(hashes)
    docs.select($"doc_id", $"text").as[(Long, String)].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def md5Hex(str: String): String =
        md.digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
      it.flatMap { case (id, text) =>
        val toks = text.trim.split("\\s+")
        if (toks.length < 8) Iterator.empty
        else {
          val dup = (0 to toks.length - 8).iterator
            .filter(i => bc.value.contains(md5Hex(toks.slice(i, i + 8).mkString(" "))))
            .toArray
          if (dup.isEmpty) Iterator.empty
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[SpanCut]
            var start = dup(0)
            var end = dup(0)
            dup.iterator.drop(1).foreach { p =>
              if (p - end > 8) {
                out += SpanCut(id, start + 1L, end + 8L, end + 8L - start)
                start = p
              }
              end = p
            }
            out += SpanCut(id, start + 1L, end + 8L, end + 8L - start)
            out.iterator
          }
        }
      }
    }
  }

  case class SemanticAudit(vec_id: Long, nearest_eval_id: Long,
      max_sim: Double, leaky: Boolean)

  /** The eval-matrix broadcast cap for [[semanticDeconStream]]: 2²⁰
    * 64-dim doubles ≈ 0.5 GB — generous for any benchmark suite, a
    * wall against a misconfigured eval predicate sweeping in the
    * corpus ([[DefaultMaxEvalWindows]]'s rationale for vectors). */
  val DefaultMaxEvalVectors: Long = 1L << 20

  /** q153 as a stream: vectors in, per-vector eval-similarity audit
    * rows out. STATELESS like [[evalSpanScrubStream]] — each arriving
    * vector is scored independently against the broadcast eval matrix
    * (no state store, no watermark, no shuffle), evals scanned in
    * ascending id with strictly-greater updates so argmax ties break
    * to the smallest eval id, similarity rounded HALF_UP at 6 and the
    * leak flag taken from the ROUNDED value — exactly the batch
    * query's contract (StreamingSpec pins stream ≡ batch q153
    * row-for-row). Append-mode safe; at-least-once redelivery re-emits
    * identical audit rows. */
  def semanticDeconStream(vecs: DataFrame, evalVecs: DataFrame,
      maxEvalVectors: Long = DefaultMaxEvalVectors): Dataset[SemanticAudit] = {
    val s = vecs.sparkSession
    import s.implicits._
    val evFrame = evalVecs
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].persist()
    val n = evFrame.count()
    require(n > 0, "semantic decon: empty eval set - every max_sim is undefined")
    require(n <= maxEvalVectors,
      s"semantic decon: eval set has $n vectors, exceeding $maxEvalVectors - " +
        "that is corpus-scale, not benchmark-scale (misconfigured eval frame?). " +
        "Raise maxEvalVectors only with the broadcast cost in mind.")
    val evals = evFrame.collect().sortBy(_._1)
      .map { case (id, v) =>
        var i = 0; var ss = 0.0
        while (i < v.length) { ss += v(i) * v(i); i += 1 }
        (id, v, math.sqrt(ss))
      }
    evFrame.unpersist()
    val bc = s.sparkContext.broadcast(evals)
    vecs.select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].mapPartitions { it =>
        it.map { case (id, v) =>
          var i = 0; var ss = 0.0
          while (i < v.length) { ss += v(i) * v(i); i += 1 }
          val nrm = math.sqrt(ss)
          var bestSim = Double.NegativeInfinity
          var bestId = -1L
          bc.value.foreach { case (eid, ev, enrm) =>
            var d = 0.0; var j = 0
            while (j < v.length) { d += v(j) * ev(j); j += 1 }
            val sim = d / (nrm * enrm)
            if (sim > bestSim) { bestSim = sim; bestId = eid }
          }
          val snapped = graft.functions.VectorOps.snapHalfUp(bestSim, 6)
          SemanticAudit(id, bestId, snapped, snapped >= 0.35)
        }
      }
  }

  case class ErResolution(record_key: Long, name: String, entity_id: Long,
      resolved_via: String, lev_dist: Long)

  /** Broadcast cap for [[erResolveStream]]'s entity-name table: 2²²
    * names ≈ a few hundred MB with block index — catalog-scale, a wall
    * against a misconfigured entity frame sweeping in the record
    * table itself. */
  val DefaultMaxEntityNames: Long = 1L << 22

  /** The ER family's streaming face: arriving RECORDS resolved against
    * the (batch-built, q155-era) entity table — the production shape
    * where clustering runs offline and ingest only PROBES it. STATELESS
    * like [[semanticDeconStream]]: the name→entity map and a token
    * block index broadcast once, each record resolves independently (no
    * state store, no shuffle). Resolution ladder per record: exact name
    * hit → its entity (`exact`, distance 0); else Levenshtein over the
    * record's BLOCKED candidates only (names sharing its adjective or
    * noun token — never the whole catalog), best within
    * [[graft.functions.EntityOps.MatchMaxDist]] wins (`fuzzy`; ties
    * break by (distance, entity id, name), deterministic); else the
    * record founds a new entity (`new`, id −1, distance −1 — the
    * offline re-cluster picks it up). Append-safe; redelivery re-emits
    * identical rows. */
  def erResolveStream(records: DataFrame, entityNames: DataFrame,
      maxNames: Long = DefaultMaxEntityNames): Dataset[ErResolution] = {
    val s = records.sparkSession
    import s.implicits._
    val named = entityNames
      .select(col("name").cast("string"), col("entity_id").cast("long"))
      .as[(String, Long)].collect().sortBy(_._1)
    require(named.nonEmpty, "er resolve: empty entity table - nothing to probe")
    require(named.length <= maxNames,
      s"er resolve: entity table has ${named.length} names, exceeding $maxNames - " +
        "that is record-scale, not catalog-scale (misconfigured entity frame?). " +
        "Raise maxEntityNames only with the broadcast cost in mind.")
    val exact = named.toMap
    val blockIdx: Map[String, Array[(String, Long)]] = named
      .flatMap { case (n, e) =>
        val t = n.split(" "); Seq(t.head -> (n, e), t.last -> (n, e)) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
    val bcExact = s.sparkContext.broadcast(exact)
    val bcBlocks = s.sparkContext.broadcast(blockIdx)
    val maxDist = graft.functions.EntityOps.MatchMaxDist
    def lev(a: String, b: String): Int = {
      val prev = Array.range(0, b.length + 1)
      val cur = new Array[Int](b.length + 1)
      var i = 1
      while (i <= a.length) {
        cur(0) = i
        var j = 1
        while (j <= b.length) {
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
          j += 1
        }
        System.arraycopy(cur, 0, prev, 0, b.length + 1)
        i += 1
      }
      prev(b.length)
    }
    records.select(col("record_key").cast("long"), col("name").cast("string"))
      .as[(Long, String)].mapPartitions { it =>
        it.map { case (key, nm) =>
          bcExact.value.get(nm) match {
            case Some(eid) => ErResolution(key, nm, eid, "exact", 0L)
            case None =>
              val toks = nm.split(" ")
              val cands =
                (bcBlocks.value.getOrElse(toks.head, Array.empty[(String, Long)]) ++
                  bcBlocks.value.getOrElse(toks.last, Array.empty[(String, Long)])).distinct
              val scored = cands.iterator
                .map { case (cn, ce) => (lev(nm, cn), ce, cn) }
                .filter(_._1 <= maxDist)
                .toSeq
              val best =
                if (scored.isEmpty) None
                else Some(scored.min(Ordering[(Int, Long, String)]))
              best match {
                case Some((d, ce, _)) => ErResolution(key, nm, ce, "fuzzy", d.toLong)
                case None => ErResolution(key, nm, -1L, "new", -1L)
              }
          }
        }
      }
  }

  /** One near-dup probe hit: an arriving doc shares a MinHash band
    * bucket with a committed corpus doc — the unit q126 reports. */
  case class NearDupHit(batch_doc: Long, corpus_doc: Long)

  /** Streaming face of the maintained band-bucket index
    * ([[graft.sources.DedupIndex]]): state per LSH (band, bucket) key is
    * the list of COMMITTED corpus doc_ids in that bucket. Corpus rows
    * (`is_probe = false`) append to their bucket's state; probe rows
    * (`is_probe = true`) emit a [[NearDupHit]] per committed member and
    * are NOT added — so probes never match each other, exactly q126's
    * batch-vs-corpus semantics, and corpus rows arriving in the same
    * micro-batch as a probe are still seen (state updates first).
    *
    * State is 4 longs per committed doc spread across bucket keys — the
    * same 4-rows-per-doc index [[graft.sources.DedupIndex]] stores on
    * disk, held here by the state store (RocksDB at scale). A pair
    * colliding in several bands emits once per band; the consumer
    * applies `dropDuplicates` (or tolerates re-flagging) — the spec
    * compares sets against the batch answer.
    *
    * HOT-BUCKET CAP (VERDICT r10 #3): a boilerplate-heavy stream can
    * drive one band bucket's membership without bound — the streaming
    * analog of the batch path's df-capped shingles. Each bucket stores
    * at most `maxBucketMembers` committed ids; past the cap, new
    * members are DROPPED from that bucket's state and every probe
    * hitting the bucket additionally emits a LOUD overflow marker
    * (`corpus_doc = `[[NearDupProbeProcessor.Overflow]]) so the
    * consumer knows recall is no longer complete there — a silently
    * truncated bucket would read as "no more dups", which is the one
    * wrong answer. The true member count keeps counting past the cap,
    * so overflow detection is exact. */
  class NearDupProbeProcessor(
      maxBucketMembers: Int = NearDupProbeProcessor.DefaultMaxBucketMembers)
      extends StatefulProcessor[String, (String, Long, Boolean), NearDupHit] {
    @transient private var members: org.apache.spark.sql.streaming.ListState[Long] = _
    @transient private var nSeen: org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      members = getHandle.getListState[Long]("members", Encoders.scalaLong, TTLConfig.NONE)
      nSeen = getHandle.getValueState[Long]("nSeen", Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long, Boolean)],
        timerValues: TimerValues): Iterator[NearDupHit] = {
      val rs = rows.toArray
      val arriving = rs.collect { case (_, id, false) => id }.distinct.sorted
      val seen0 = if (nSeen.exists()) nSeen.get() else 0L
      if (arriving.nonEmpty) {
        // membership check against state: an at-least-once upstream
        // re-delivers committed rows across micro-batches, and a
        // re-delivered member must neither re-append (state bloat,
        // duplicate hits) nor re-count (a PHANTOM overflow marker and a
        // genuinely novel member squeezed out). One bounded list read
        // (≤ cap entries) per batch with arrivals. Below the cap nSeen
        // is now exactly the distinct member count; past it, a dropped
        // member's re-delivery still re-counts (tracking dropped ids
        // would be unbounded) — an overestimate only AFTER overflow is
        // already latched, so the marker stays exact: nSeen > cap ⟹
        // more than cap DISTINCT arrivals ⟹ at least one was dropped.
        val current = members.get().toSet
        val novel = arriving.filterNot(current)
        if (novel.nonEmpty) {
          val room = math.max(0L, maxBucketMembers - seen0).toInt
          val kept = novel.take(room)
          if (kept.nonEmpty) members.appendList(kept)
          nSeen.update(seen0 + novel.length)
        }
      }
      val probes = rs.collect { case (_, id, true) => id }.distinct.sorted
      if (probes.isEmpty) Iterator.empty
      else {
        val committed = members.get().toArray
        val overflowed = (if (nSeen.exists()) nSeen.get() else 0L) > maxBucketMembers
        probes.iterator.flatMap { p =>
          val hits = committed.iterator.map(c => NearDupHit(p, c))
          if (overflowed) hits ++ Iterator.single(NearDupHit(p, NearDupProbeProcessor.Overflow))
          else hits
        }
      }
    }
  }

  object NearDupProbeProcessor {
    /** Per-(band, bucket) committed-member cap — sized like the batch
      * path's candidate bounds: 4 bands × this many ids per bucket
      * bounds any probe's fan-out. */
    val DefaultMaxBucketMembers: Int = 1024
    /** Sentinel `corpus_doc` marking "this bucket overflowed its member
      * cap — near-dup recall on it is incomplete". Real doc_ids are
      * non-negative by the documents-table contract. */
    val Overflow: Long = -1L
  }

  /** q126 as a stream: docs (doc_id, text, is_probe) in, near-dup hits
    * out. The banding is [[graft.functions.TextOps.bandRowsPerRow]] —
    * the same slices and [[graft.functions.TextOps.bandStackExpr]]
    * banding the batch query and the on-disk index use, in per-row form
    * (streaming-legal, value-identical), so the three surfaces cannot
    * drift. StreamingSpec proves set parity with q126's batch answer on
    * a corpus split across micro-batches. */
  def nearDupProbeStream(docs: DataFrame,
      maxBucketMembers: Int = NearDupProbeProcessor.DefaultMaxBucketMembers)
      : Dataset[NearDupHit] = {
    val s = docs.sparkSession
    import s.implicits._
    graft.functions.TextOps.bandRowsPerRow(docs)
      .select(concat_ws(":", col("band"), col("bucket")).as("k"),
        col("doc_id"), col("is_probe"))
      .as[(String, Long, Boolean)]
      .groupByKey(_._1)
      .transformWithState(new NearDupProbeProcessor(maxBucketMembers),
        TimeMode.None(), OutputMode.Append())
  }

  /** STREAM-STREAM interval join — q121's conversion-candidate pairs
    * computed continuously: views and purchases arrive as two streams,
    * and each view matches the same user's purchases in the following
    * hour. Both sides carry a watermark and the join condition bounds
    * event time in BOTH directions, which is exactly what lets Spark
    * evict buffered rows: a view older than watermark−1h can never
    * match a future purchase and its state is dropped, so state size
    * tracks the time bound, not the stream length.
    *
    * `joinType = "leftOuter"` additionally emits unconverted views
    * (null purchase columns) once the watermark proves no match can
    * still arrive — the streaming version of a conversion-funnel
    * left join. Outer results are therefore DELAYED by the watermark,
    * not wrong; the spec drives the watermark forward to observe them.
    *
    * Columns: views(user_id, view_id, view_ts),
    * purchases(p_user, purchase_id, purchase_ts, amount) — the same
    * shapes the batch twin builds from `events`. */
  def intervalJoinStream(views: DataFrame, purchases: DataFrame,
      joinType: String = "inner", watermark: String = "2 hours"): DataFrame = {
    val v = views.withWatermark("view_ts", watermark)
    val p = purchases.withWatermark("purchase_ts", watermark)
    v.join(p,
        expr("user_id = p_user AND " +
          "purchase_ts >= view_ts AND purchase_ts < view_ts + INTERVAL 1 HOUR"),
        joinType)
      .select(col("user_id"), col("view_id"), col("purchase_id"), col("amount"))
  }

  /** File-based streaming read of an events-shaped directory (S2's
    * day-loop extract as a real stream source). */
  def readEventStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .json(path)

  case class ImageDupHit(probe_id: Long, corpus_id: Long, hamming: Int)

  /** A committed image's identity in one perceptual-hash band bucket. */
  case class ImageBandMember(id: Long, hi: Long, lo: Long)

  /** Streaming face of q131's VISUAL near-dup detection: state per
    * aHash (band, value) key is the committed corpus images in that
    * bucket (id + full split hash, so the exact Hamming rescore runs
    * in-state). Corpus rows (`is_probe = false`) append; probe rows emit
    * an [[ImageDupHit]] per committed member within Hamming ≤ 3 and are
    * NOT added — probes never match each other, and corpus rows in the
    * same micro-batch are still seen (state updates first), the
    * [[NearDupProbeProcessor]] contract. Pigeonhole recall is preserved
    * per band: a ≤3-distance pair agrees on ≥1 of the 4 16-bit bands,
    * so it collides on at least one state key. A pair sharing several
    * bands emits once per band; consumers dedup (the spec compares
    * sets). State is 4 × 24 bytes per committed image — RocksDB-ready. */
  class ImageDupProbeProcessor
      extends StatefulProcessor[String, (String, Long, Long, Long, Boolean), ImageDupHit] {
    @transient private var members: org.apache.spark.sql.streaming.ListState[ImageBandMember] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[ImageBandMember](
        "members", Encoders.product[ImageBandMember], TTLConfig.NONE)
    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long, Long, Long, Boolean)],
        timerValues: TimerValues): Iterator[ImageDupHit] = {
      val rs = rows.toArray
      // distinct on the FULL member, not the id: a committed VIDEO
      // contributes one member per distinct sampled-frame hash, and
      // dropping a second hash that collides with a sibling frame on
      // this band value would break the per-band pigeonhole recall
      val arriving = rs.collect { case (_, id, hi, lo, false) => ImageBandMember(id, hi, lo) }
        .distinct.sortBy(m => (m.id, m.hi, m.lo))
      if (arriving.nonEmpty) members.appendList(arriving.toArray)
      val probes = rs.collect { case (_, id, hi, lo, true) => (id, hi, lo) }.distinct.sorted
      if (probes.isEmpty) Iterator.empty
      else {
        val committed = members.get().toArray
        probes.iterator.flatMap { case (pid, phi, plo) =>
          committed.iterator.flatMap { m =>
            val d = java.lang.Long.bitCount(phi ^ m.hi) + java.lang.Long.bitCount(plo ^ m.lo)
            if (d <= 3) Some(ImageDupHit(pid, m.id, d)) else None
          }
        }
      }
    }
  }

  /** q131 as a stream: media payloads (media_id, data, is_probe) in,
    * visual near-dup hits out. Decode + hash is the SAME pure-JVM chain
    * the batch queries run — container-sniffed dispatch to
    * [[graft.multimodal.MediaHeaders.pngPixels]] or
    * [[graft.multimodal.JpegCodec.decode]] (q164's cross-container
    * contract holds live: a JPEG-committed image matches a PNG probe of
    * the same pixels), then [[graft.multimodal.Multimodal.ahash64]] —
    * inside the per-row flatMap, so the surfaces cannot drift;
    * undecodable payloads drop silently (the q110 corruption contract).
    * VIDEO payloads ride the same key space (q165's composition, live):
    * a multi-frame MJPEG is thinned stride-2 and each kept frame hashes
    * like an image under the video's id — so a committed video is
    * findable by any of its sampled frames, a probe video hits on any
    * sampled frame, and a frame the thinning dropped is invisible, the
    * sampling policy observable in the stream. With
    * `keyframes = true` the thinning is q177's SCENE-CHANGE selection
    * instead: every cut registers regardless of scene length, so a
    * one-frame scene between stride positions — which stride-2 is
    * structurally blind to — still makes the video findable by that
    * scene (decode cost rises from half the frames to all of them; the
    * hash/state path is unchanged). The blob never reaches
    * the state store — only 3-long hash rows fan out to band keys. */
  def imageDupProbeStream(media: DataFrame,
      keyframes: Boolean = false): Dataset[ImageDupHit] = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("media_id"), col("data"), col("is_probe"))
      .as[(Long, Array[Byte], Boolean)]
      .flatMap { case (id, bytes, isProbe) =>
        import graft.multimodal.{JpegCodec, MediaHeaders, Multimodal}
        // container sniff, now including VIDEO: a single image (PNG or
        // one JPEG) hashes whole; a MULTI-frame MJPEG stream runs
        // q165's chain — stride-2 keyframe thinning, per-frame decode —
        // and contributes one hash per kept decodable frame, so a video
        // is "in the corpus" through its sampled frames and a probe
        // video hits when ANY sampled frame matches. Undecodable
        // payloads and frames still drop silently (q110's contract).
        // the MULTI-frame check must run before the single-JPEG decode:
        // an MJPEG stream's first frame IS a valid JPEG, and decoding it
        // whole would silently drop every later frame (PNG goes first —
        // its magic is strict, while zlib bytes could alias JPEG markers)
        val frames: Seq[(Long, Long, Array[Int])] =
          MediaHeaders.pngPixels(bytes) match {
            case Some(f) => Seq(f)
            case None =>
              val fs = MediaHeaders.mjpegFrames(bytes)
              if (fs.size >= 2) {
                // reuse the sniff's split — the selector must not walk
                // the container a second time (ADVICE r16)
                if (keyframes) Multimodal.sceneKeyframesOf(fs)
                else MediaHeaders.mjpegFrames(Multimodal.frameSample(bytes, 2))
                  .flatMap(f => JpegCodec.decode(f))
              } else JpegCodec.decode(bytes).toSeq
          }
        frames.flatMap { case (w, h, px) =>
          val (hi, lo, _) = Multimodal.ahash64(w.toInt, h.toInt, px)
          Seq((0, lo & 0xFFFFL), (1, (lo >> 16) & 0xFFFFL),
              (2, hi & 0xFFFFL), (3, (hi >> 16) & 0xFFFFL))
            .map { case (b, v) => (s"$b:$v", id, hi, lo, isProbe) }
        }.distinct
      }
      .groupByKey(_._1)
      .transformWithState(new ImageDupProbeProcessor, TimeMode.None(), OutputMode.Append())
  }

  case class CrossModalHit(modality: String, doc_probe: Long, doc_corpus: Long)

  /** State + verdict for the cross-modal probe: one key space carries
    * BOTH arms — image band keys ("i:b:v", members rescored to exact
    * Hamming ≤ 3 on their stored fingerprints) and caption bucket keys
    * ("c:band:bucket", bucket equality IS the q30 candidate predicate,
    * so every committed member is a hit). Probes never enter state, so
    * probes cannot match each other; same-batch commits are visible to
    * same-batch probes (arrivals append before probes scan — the
    * [[ImageDupProbeProcessor]] contract).
    *
    * HOT-KEY GATE (ADVICE r17): image band keys carry the batch q198's
    * corpus-side [[graft.multimodal.Multimodal.ModalityBandCap]] — a
    * per-key counter tracks committed membership, and once it exceeds
    * the cap the key stops matching AND stops storing members (only the
    * counter grows), exactly the batch gate's "hot bk contributes no
    * candidates" semantics, so a slate/black-frame concentration costs
    * O(cap) state and O(probes) work instead of O(committed members).
    * The counter counts DISTINCT members (ADVICE r18): while under the
    * cap the stored list is complete, so a cross-batch re-commit of the
    * same doc is recognized and not re-counted — matching the batch
    * gate, which counts each stored band row once; past the cap the key
    * is hot by genuine membership and stays hot, as the batch gate's
    * stored rows would. Append-stream caveat (the same one the
    * class-upgrade note above documents): hits emitted while the key
    * was still under the cap are not retracted when it crosses — the
    * batch report, recomputed, would drop them. Caption keys stay
    * uncapped, mirroring q198's uncapped caption arm; their list is
    * append-only, so a cross-batch re-commit of the same captioned doc
    * appends again and later probes repeat its hit — dedup there would
    * cost an O(members) read per arrival on exactly the unbounded arm
    * (the corpus table's merge key makes production re-commits replace,
    * not duplicate, so the batch face never sees the doubled row). */
  class CrossModalProbeProcessor(
      cap: Int = graft.multimodal.Multimodal.ModalityBandCap)
      extends StatefulProcessor[String, (String, Long, Long, Long, Boolean), CrossModalHit] {
    @transient private var members: org.apache.spark.sql.streaming.ListState[ImageBandMember] = _
    @transient private var nMembers: org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      members = getHandle.getListState[ImageBandMember](
        "members", Encoders.product[ImageBandMember], TTLConfig.NONE)
      nMembers = getHandle.getValueState[Long](
        "nMembers", Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long, Long, Long, Boolean)],
        timerValues: TimerValues): Iterator[CrossModalHit] = {
      val image = key.startsWith("i:")
      val rs = rows.toArray
      val arriving = rs.collect { case (_, id, hi, lo, false) => ImageBandMember(id, hi, lo) }
        .distinct.sortBy(m => (m.id, m.hi, m.lo))
      val prev = if (nMembers.exists()) nMembers.get() else 0L
      // CROSS-BATCH DEDUP (ADVICE r18): a member re-emitted in a later
      // batch (re-commit/upsert of the same doc — same deterministic
      // fingerprint) must not inflate the counter, or a key could
      // falsely trip the cap and permanently diverge from batch q198's
      // gate, which counts each stored band row once. While the key is
      // under the cap the stored list is COMPLETE (truncation only ever
      // drops rows on the batch that crosses it), so the membership
      // check is O(cap); past the cap the key is already hot by genuine
      // distinct membership and further inflation changes nothing.
      val fresh =
        if (image && arriving.nonEmpty && prev <= cap) {
          val stored = members.get().toSet
          arriving.filterNot(stored.contains)
        } else arriving
      val total = prev + fresh.length
      if (fresh.nonEmpty) {
        // past the cap the batch gate drops the whole key, so stored
        // members are dead weight — keep only enough rows to stay
        // over-complete below the cap; the counter alone witnesses "hot"
        val toStore =
          if (image) fresh.take(math.max(0L, cap + 1 - prev).toInt)
          else fresh
        if (toStore.nonEmpty) members.appendList(toStore)
        nMembers.update(total)
      }
      val probes = rs.collect { case (_, id, hi, lo, true) => (id, hi, lo) }.distinct.sorted
      if (probes.isEmpty || (image && total > cap)) Iterator.empty
      else {
        val committed = members.get().toArray
        probes.iterator.flatMap { case (pid, phi, plo) =>
          committed.iterator.flatMap { m =>
            if (!image) Some(CrossModalHit("caption", pid, m.id))
            else {
              val d = java.lang.Long.bitCount(phi ^ m.hi) +
                java.lang.Long.bitCount(plo ^ m.lo)
              if (d <= 3) Some(CrossModalHit("image", pid, m.id)) else None
            }
          }
        }
      }
    }
  }

  /** q198 as a stream: captioned docs (doc_id, text, is_probe) in,
    * per-modality duplicate hits out — which committed captioned image
    * does an arriving doc duplicate, and in which modality. One per-row
    * pass derives BOTH arms from the caption text through the SAME
    * chains the batch queries read ([[graft.multimodal.Multimodal
    * .captionSig]] ≡ the q30 signature, [[graft.multimodal.Multimodal
    * .captionedPngBytes]] + real PNG decode + aHash ≡ q195's image
    * arm), then fans out to 8 keys: 4 image band keys carrying the
    * 64-bit fingerprint and 4 caption bucket keys. q195's
    * classification is a grouping of the emitted hits (a pair's class
    * can UPGRADE as later commits land — recaptioned → dup_pair when
    * the caption arm fires too — which an append stream reports as a
    * second tagged hit, never a retraction). Non-image docs
    * ([[graft.multimodal.Multimodal.hasImageId]] false) emit nothing;
    * the text never reaches the state store — only 24-byte members per
    * key. */
  def crossModalProbeStream(docs: DataFrame,
      bandCap: Int = graft.multimodal.Multimodal.ModalityBandCap)
      : Dataset[CrossModalHit] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("text"), col("is_probe"))
      .as[(Long, String, Boolean)]
      .flatMap { case (id, text, isProbe) =>
        import graft.multimodal.{MediaHeaders, Multimodal}
        if (!Multimodal.hasImageId(id)) Seq.empty[(String, Long, Long, Long, Boolean)]
        else {
          val sig = Multimodal.captionSig(text)
          val seed = sig.map(g => java.lang.Long.parseLong(g(0), 16)).getOrElse(0L)
          val img = MediaHeaders.pngPixels(Multimodal.captionedPngBytes(seed)).toSeq
            .flatMap { case (w, h, px) =>
              val (hi, lo, _) = Multimodal.ahash64(w.toInt, h.toInt, px)
              Seq((0, lo & 0xFFFFL), (1, (lo >> 16) & 0xFFFFL),
                  (2, hi & 0xFFFFL), (3, (hi >> 16) & 0xFFFFL))
                .map { case (b, v) => (s"i:$b:$v", id, hi, lo, isProbe) }
            }
          val cap = sig.toSeq.flatMap { g =>
            (0 until 4).map(b =>
              (s"c:$b:${g(2 * b) + g(2 * b + 1)}", id, 0L, 0L, isProbe))
          }
          img ++ cap
        }
      }
      .groupByKey(_._1)
      .transformWithState(new CrossModalProbeProcessor(bandCap),
        TimeMode.None(), OutputMode.Append())
  }
}
