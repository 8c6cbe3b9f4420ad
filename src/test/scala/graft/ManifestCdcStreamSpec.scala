package graft

import graft.sources.ManifestTable
import java.nio.file.Files
import org.apache.spark.sql.streaming.StreamingQuery

/** ManifestTable as a structured-streaming CDC source
  * (`readStream.format("graft-manifest-cdc")`): commits become
  * micro-batches, offsets are table versions, restarts resume from the
  * sink checkpoint. */
class ManifestCdcStreamSpec extends SparkSpec {

  private def mk(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  test("each commit is a micro-batch of CDC events; a restarted stream " +
    "resumes from the checkpointed VERSION and emits only what it missed") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cdcsrc").toString
    val ckpt = Files.createTempDirectory("graft-cdcsrc-ckpt").toString
    val out = Files.createTempDirectory("graft-cdcsrc-out").toString
    ManifestTable.merge(mk(1L -> "a", 2L -> "b"), root, Seq("id"))

    def start(): StreamingQuery = spark.readStream
      .format("graft-manifest-cdc")
      .option("path", root).option("key", "id").load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()

    def sunk(): Set[(Long, String, String)] = spark.read.parquet(out)
      .selectExpr("id", "v", "_change_type")
      .as[(Long, String, String)].collect().toSet

    val q = start()
    q.processAllAvailable()
    assert(sunk() == Set((1L, "a", "insert"), (2L, "b", "insert")),
      "bootstrap batch = the starting snapshot as inserts")

    ManifestTable.merge(mk(2L -> "B", 3L -> "c"), root, Seq("id"))
    q.processAllAvailable()
    assert(sunk() == Set((1L, "a", "insert"), (2L, "b", "insert"),
      (2L, "B", "update_postimage"), (3L, "c", "insert")),
      "second micro-batch = exactly the v1→v2 delta")
    q.stop()

    // a commit landing while the stream is DOWN is picked up on restart —
    // and ONLY it (the checkpoint pins the resume version)
    ManifestTable.merge(mk(1L -> "A2"), root, Seq("id"))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(sunk() == Set((1L, "a", "insert"), (2L, "b", "insert"),
      (2L, "B", "update_postimage"), (3L, "c", "insert"),
      (1L, "A2", "update_postimage")),
      "restart emits only the offline v2→v3 delta, no replay, no gap")
  }

  test("startingVersion skips the bootstrap; preimages add the Delta-CDF " +
    "old-image events") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cdcsrc2").toString
    val ckpt = Files.createTempDirectory("graft-cdcsrc2-ckpt").toString
    val out = Files.createTempDirectory("graft-cdcsrc2-out").toString
    ManifestTable.merge(mk(1L -> "a", 2L -> "b"), root, Seq("id"))
    ManifestTable.merge(mk(2L -> "B"), root, Seq("id"))

    val q = spark.readStream
      .format("graft-manifest-cdc")
      .option("path", root).option("key", "id")
      .option("startingVersion", "1").option("preimages", "true").load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(out)
      .selectExpr("id", "v", "_change_type")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((2L, "B", "update_postimage"), (2L, "b", "update_preimage")),
      s"from v1, with preimages, the only events are 2's update pair; got $got")
  }

  test("the CDC stream drives IncrementalView maintenance: a foreachBatch " +
    "consumer folding maintain() over the micro-batches ends at exactly the " +
    "full recompute — the streaming face of the maintained-view story") {
    import graft.sources.IncrementalView
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cdcsrc-iv").toString
    val ckpt = Files.createTempDirectory("graft-cdcsrc-iv-ckpt").toString
    ManifestTable.merge(
      Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 5L)).toDF("id", "g", "x"),
      root, Seq("id"))

    // state starts empty (same shape compute() emits)
    @volatile var state = IncrementalView.compute(
      Seq.empty[(Long, String, Long)].toDF("id", "g", "x"), Seq("g"), "x")

    val q = spark.readStream
      .format("graft-manifest-cdc")
      .option("path", root).option("key", "id").option("preimages", "true").load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        state = IncrementalView.maintain(state, batch, Seq("g"), "x")
          .localCheckpoint() // pin each fold so state never replans the chain
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    // more commits while the stream runs: an update that moves a row across
    // groups, a delete-shaped retraction via group emptying, a new group
    ManifestTable.merge(Seq((3L, "g1", 7L)).toDF("id", "g", "x"), root, Seq("id"))
    q.processAllAvailable()
    ManifestTable.merge(Seq((4L, "g3", 100L)).toDF("id", "g", "x"), root, Seq("id"))
    q.processAllAvailable()
    q.stop()

    val expect = IncrementalView.compute(
      ManifestTable.read(spark, root), Seq("g"), "x")
      .as[(String, Long, Long)].collect().toSet
    val got = state.as[(String, Long, Long)].collect().toSet
    assert(got == expect, s"streamed maintain drifted: $got vs $expect")
    // g2 emptied when row 3 hopped to g1 — retraction must drop the group
    assert(!got.exists(_._1 == "g2"))
  }

  test("lake-to-lake: CDC source → transform → manifest SINK keeps a derived " +
    "table current across commits AND a stream restart (offsets in the " +
    "checkpoint, commits via the atomic pointer swap)") {
    import spark.implicits._
    val a = Files.createTempDirectory("graft-l2l-a").toString
    val b = Files.createTempDirectory("graft-l2l-b").toString
    val ckpt = Files.createTempDirectory("graft-l2l-ckpt").toString
    ManifestTable.merge(
      Seq((1L, 10L), (2L, 20L)).toDF("id", "x"), a, Seq("id"))

    def start(): StreamingQuery = spark.readStream
      .format("graft-manifest-cdc")
      .option("path", a).option("key", "id").load()
      .where($"_change_type" =!= "delete")
      .selectExpr("id", "x * 2 AS y")
      .writeStream.format("graft-manifest")
      .option("path", b).option("key", "id")
      .option("checkpointLocation", ckpt)
      .start()

    def derived(): Set[(Long, Long)] =
      ManifestTable.read(spark, b).as[(Long, Long)].collect().toSet

    val q = start()
    q.processAllAvailable()
    assert(derived() == Set(1L -> 20L, 2L -> 40L))

    ManifestTable.merge(Seq((2L, 25L), (3L, 5L)).toDF("id", "x"), a, Seq("id"))
    q.processAllAvailable()
    assert(derived() == Set(1L -> 20L, 2L -> 50L, 3L -> 10L),
      "the derived table must absorb the upstream upsert incrementally")
    q.stop()

    ManifestTable.merge(Seq((1L, 100L)).toDF("id", "x"), a, Seq("id"))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(derived() == Set(1L -> 200L, 2L -> 50L, 3L -> 10L),
      "restart consumes exactly the offline delta into the derived table")
  }

  test("sink replay protection: an addBatch replay with an already-committed " +
    "batch id is a no-op (no table version bump)") {
    import graft.sources.ManifestStreamSink
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val root = Files.createTempDirectory("graft-sink-replay").toString
    val sink = new ManifestStreamSink(root, Seq("id"), OutputMode.Append(),
      txnId = "testq", appendOnly = false)
    sink.addBatch(0L, mk(1L -> "a"))
    assert(ManifestTable.currentVersion(root) == 1)
    sink.addBatch(0L, mk(1L -> "REPLAYED"))
    assert(ManifestTable.currentVersion(root) == 1, "replayed batch must be skipped")
    assert(ManifestTable.read(spark, root).as[(Long, String)].collect().toSet
      == Set(1L -> "a"))
    sink.addBatch(1L, mk(2L -> "b"))
    assert(ManifestTable.currentVersion(root) == 2)
  }

  test("sink txn lineage survives RESPELLING the checkpoint path (relative " +
    "vs absolute, trailing slash, file: URI) and two distinct checkpoints " +
    "never collide (ADVICE r10)") {
    import graft.sources.ManifestStreamSink
    val ckpt = Files.createTempDirectory("graft-sink-canon").toString
    val spellings = Seq(ckpt, ckpt + "/", "file:" + ckpt, "file://" + ckpt,
      ckpt + "/./")
    val ids = spellings.map(p =>
      ManifestStreamSink.digest(ManifestStreamSink.canonicalCheckpoint(p)))
    assert(ids.distinct.size == 1,
      s"every spelling must map to ONE marker lineage: ${spellings.zip(ids)}")
    val other = Files.createTempDirectory("graft-sink-canon2").toString
    assert(ManifestStreamSink.digest(ManifestStreamSink.canonicalCheckpoint(other))
      != ids.head, "distinct checkpoints must not share a lineage")
  }

  test("an UNTAGGED commit landing on the state root between batches does " +
    "not reset the replay watermark — the tag scan reads retained history, " +
    "not just the head commit (ADVICE r10)") {
    import graft.sources.IncrementalView
    import spark.implicits._
    val state = Files.createTempDirectory("graft-eo-untagged").toString
    val b0 = Seq(("g1", 10L, "insert")).toDF("g", "x", "_change_type")
    IncrementalView.applyBatch(state, b0, batchId = 0L, Seq("g"), "x")
    def stateSet(): Set[(String, Long, Long)] =
      ManifestTable.read(spark, state).as[(String, Long, Long)].collect().toSet
    assert(stateSet() == Set(("g1", 1L, 10L)))
    // an operator action recommits the state WITHOUT a tag (compaction,
    // restore, manual rewrite) — the head commit now carries no batch=
    ManifestTable.commitSnapshot(
      ManifestTable.read(spark, state).localCheckpoint(), state, Nil)
    // replay batch 0: before the history-scan fix this re-applied and
    // double-counted g1
    IncrementalView.applyBatch(state, b0, batchId = 0L, Seq("g"), "x")
    assert(stateSet() == Set(("g1", 1L, 10L)),
      "replay after an untagged commit must still be skipped")
  }

  test("exactly-once maintained view: startMaintenance keeps a ManifestTable " +
    "state equal to the full recompute across insert/update/delete commits " +
    "and a restart, and a REPLAYED batch id is a no-op (tag inside the commit)") {
    import graft.sources.IncrementalView
    import spark.implicits._
    val corpus = Files.createTempDirectory("graft-eo-corpus").toString
    val state = Files.createTempDirectory("graft-eo-state").toString
    val ckpt = Files.createTempDirectory("graft-eo-ckpt").toString
    ManifestTable.merge(
      Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 5L)).toDF("id", "g", "x"),
      corpus, Seq("id"))

    def stateSet(): Set[(String, Long, Long)] =
      ManifestTable.read(spark, state).as[(String, Long, Long)].collect().toSet
    def expect(): Set[(String, Long, Long)] = IncrementalView.compute(
      ManifestTable.read(spark, corpus).select($"g", $"x"), Seq("g"), "x")
      .as[(String, Long, Long)].collect().toSet

    val q = IncrementalView.startMaintenance(
      spark, corpus, state, Seq("id"), Seq("g"), "x", ckpt)
    q.processAllAvailable()
    assert(stateSet() == expect())

    ManifestTable.merge(Seq((3L, "g1", 7L)).toDF("id", "g", "x"), corpus, Seq("id"))
    q.processAllAvailable()
    assert(stateSet() == expect(), "group-hopping update must retract g2")
    q.stop()

    // offline DELETE (snapshot recommit without id=2) + restart
    ManifestTable.commitSnapshot(
      ManifestTable.read(spark, corpus).where($"id" =!= 2L), corpus, Nil)
    val q2 = IncrementalView.startMaintenance(
      spark, corpus, state, Seq("id"), Seq("g"), "x", ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert(stateSet() == expect(), "restart must absorb the offline delete")

    // replay: re-deliver an OLD batch id with a poisoned delta — the tag
    // read from the current state commit must reject it untouched. The
    // stream's tags are SCOPED to its checkpoint; a replay is only a
    // replay within that scope, so the hand-replay derives it the same way
    val vBefore = ManifestTable.currentVersion(state)
    val poisoned = Seq(("g1", 999L, "insert")).toDF("g", "x", "_change_type")
    val scope = graft.sources.ManifestStreamSink.digest(
      graft.sources.ManifestStreamSink.canonicalCheckpoint(ckpt))
    IncrementalView.applyBatch(state, poisoned, batchId = 0L, Seq("g"), "x", scope)
    assert(ManifestTable.currentVersion(state) == vBefore,
      "a replayed batch id must not commit a new state version")
    assert(stateSet() == expect())
    // the audit surface: every state version's history row names the
    // batch that produced it
    val tags = ManifestTable.history(state).flatMap(_.tag)
    assert(tags.nonEmpty && tags.forall(_.startsWith("batch=")), tags.toString)
  }

  test("a restart whose checkpointed version was VACUUMED fails loudly — " +
    "never silently skips the missing changes") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cdcsrc-vac").toString
    val ckpt = Files.createTempDirectory("graft-cdcsrc-vac-ckpt").toString
    val out = Files.createTempDirectory("graft-cdcsrc-vac-out").toString
    ManifestTable.merge(mk(1L -> "a"), root, Seq("id"))
    ManifestTable.merge(mk(2L -> "b"), root, Seq("id"))
    def start(): StreamingQuery = spark.readStream
      .format("graft-manifest-cdc")
      .option("path", root).option("key", "id").load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    val q = start()
    q.processAllAvailable() // checkpoint now at v2
    q.stop()
    ManifestTable.merge(mk(3L -> "c"), root, Seq("id")) // v3
    ManifestTable.vacuum(root, keepVersions = 1, orphanGraceMs = 0) // drops v1, v2
    val q2 = start()
    val e = intercept[Exception] { q2.processAllAvailable() }
    q2.stop()
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("not retained"))),
      s"expected a loud not-retained failure, got $e")
  }

  test("the source refuses to start on an empty root, and requires the key option") {
    val empty = Files.createTempDirectory("graft-cdcsrc3").toString
    val e = intercept[Exception] {
      spark.readStream.format("graft-manifest-cdc")
        .option("path", empty).option("key", "id").load()
    }
    assert(e.getMessage.contains("no committed version"))
    ManifestTable.merge(mk(1L -> "a"), empty, Seq("id"))
    val e2 = intercept[Exception] {
      spark.readStream.format("graft-manifest-cdc").option("path", empty).load()
    }
    assert(e2.getMessage.contains("'key'"))
  }
}
