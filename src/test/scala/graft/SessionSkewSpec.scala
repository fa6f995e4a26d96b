package graft

import graft.ext.SkewTools
import graft.query.QueryParams
import graft.store.TableStore
import graft.streaming.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class KeyPrice(o_orderkey: Long, o_totalprice: Double)

class SessionSkewSpec extends SparkSpec {

  test("flatMapGroupsWithState sessionization: event-time timeout closes sessions deterministically") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    val stream = MemoryStream[Sessionize.Event]
    val out = Sessionize.sessions(stream.toDS(), gapMs = 500)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()
    // batch 1: two users open sessions; watermark still behind timeouts
    stream.addData(
      Sessionize.Event(1L, ts(1000L), 2.0), Sessionize.Event(1L, ts(1200L), 3.0),
      Sessionize.Event(2L, ts(1100L), 1.0))
    q.processAllAvailable()
    assert(spark.sql("SELECT * FROM sessions").count() === 0)
    // batch 2: far-future event advances the watermark past both timeouts
    stream.addData(Sessionize.Event(3L, ts(10000L), 5.0))
    q.processAllAvailable()
    // batch 3: timeouts fire against the batch-2 watermark
    stream.addData(Sessionize.Event(3L, ts(10100L), 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT user_id, n_events, total FROM sessions ORDER BY user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.contains((1L, 2L, 5.0)) && rows.contains((2L, 1L, 1.0)))
  }

  test("streaming sessionization: gap WITHIN a batch splits sessions (matches batch twin)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    val stream = MemoryStream[Sessionize.Event]
    val out = Sessionize.sessions(stream.toDS(), gapMs = 500)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sessions_gap").start()
    // one batch, one user, a 48.8s gap between events -> two sessions
    stream.addData(
      Sessionize.Event(1L, ts(1000L), 2.0), Sessionize.Event(1L, ts(1200L), 3.0),
      Sessionize.Event(1L, ts(50000L), 7.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT n_events, total FROM sessions_gap ORDER BY start_millis")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // first session closed immediately by the in-batch gap
    assert(rows.toSeq === Seq((2L, 5.0)))
  }

  test("streaming sessionization: late stray event forms its own earlier session, not a merge") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    val stream = MemoryStream[Sessionize.Event]
    // watermark tolerance (10s) far wider than the session gap (500ms):
    // a late event > gap before the open session is admissible
    val out = Sessionize.sessions(stream.toDS(), gapMs = 500, watermarkMs = 10000)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sessions_stray").start()
    stream.addData(
      Sessionize.Event(1L, ts(20000L), 2.0), Sessionize.Event(1L, ts(20200L), 3.0))
    q.processAllAvailable()
    // batch 2: stray at 12000 — 8s before the open session's start, above
    // the lagging watermark (20200 - 10000 = 10200). Must close as its own
    // session, NOT min()-merge into [20000, 20200].
    stream.addData(Sessionize.Event(1L, ts(12000L), 7.0))
    q.processAllAvailable()
    val strayRows = spark.sql(
      "SELECT n_events, total, start_millis, end_millis FROM sessions_stray")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(strayRows.toSeq === Seq((1L, 7.0, 12000L, 12000L)))
    // advance the watermark past the open session's timeout and fire it
    stream.addData(Sessionize.Event(2L, ts(40000L), 1.0))
    q.processAllAvailable()
    stream.addData(Sessionize.Event(2L, ts(40100L), 1.0))
    q.processAllAvailable()
    q.stop()
    val main = spark.sql(
      "SELECT n_events, total, start_millis FROM sessions_stray WHERE user_id = 1 ORDER BY start_millis")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // open session closed untouched by the stray
    assert(main.toSeq === Seq((1L, 7.0, 12000L), (2L, 5.0, 20000L)))
  }

  test("streaming sessionization: late prefix CHAINS into the open session through in-batch events") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    val stream = MemoryStream[Sessionize.Event]
    val out = Sessionize.sessions(stream.toDS(), gapMs = 500, watermarkMs = 10000)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sessions_chain").start()
    // batch 1: open session at start=20000
    stream.addData(Sessionize.Event(1L, ts(20000L), 2.0))
    q.processAllAvailable()
    // batch 2: late events 19100, 19600. 19100 is 900ms (> gap) before the
    // open start, but chains through 19600 (gaps 500 and 400): ONE session.
    // The old distance-to-start rule wrongly closed 19100 alone.
    stream.addData(
      Sessionize.Event(1L, ts(19100L), 3.0), Sessionize.Event(1L, ts(19600L), 5.0))
    q.processAllAvailable()
    assert(spark.sql("SELECT * FROM sessions_chain").count() === 0)
    // advance watermark past the open session's timeout and fire it
    stream.addData(Sessionize.Event(2L, ts(40000L), 1.0))
    q.processAllAvailable()
    stream.addData(Sessionize.Event(2L, ts(40100L), 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT n_events, total, start_millis, end_millis FROM sessions_chain WHERE user_id = 1")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq((3L, 10.0, 19100L, 20000L)))
  }

  test("batch sessionization: gap splits sessions (window algebra)") {
    val s = spark; import s.implicits._
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    val ev = Seq(
      (1L, ts(0L), 1.0), (1L, ts(400L), 1.0),      // session 1
      (1L, ts(5000L), 2.0),                        // session 2 (gap > 1s)
      (2L, ts(100L), 9.0)).toDF("user_id", "ts", "value")
    val sess = Sessionize.sessionsBatch(ev, gapMs = 1000)
    assert(sess.count() === 3)
    val u1 = sess.filter(col("user_id") === 1).orderBy("start_ts").collect()
    assert(u1.map(_.getAs[Long]("n_events")).toSeq === Seq(2L, 1L))
  }

  test("saltedJoin: identical results to plain join, salt never leaks") {
    val s = spark; import s.implicits._
    // skew: key 7 holds 90% of rows
    val big = (1 to 1000).map(i => (if (i <= 900) 7L else i.toLong, i)).toDF("k", "v")
    val dim = Seq((7L, "hot"), (950L, "cold")).toDF("k", "label")
    val plain = big.join(dim, Seq("k")).agg(count(lit(1)), sum(col("v"))).collect()(0)
    val salted = SkewTools.saltedJoin(big, dim, "k", salt = 8)
    assert(salted.columns.toSet === Set("k", "v", "label"))
    val sres = salted.agg(count(lit(1)), sum(col("v"))).collect()(0)
    assert(plain.getLong(0) === sres.getLong(0) && plain.getLong(1) === sres.getLong(1))
    val hh = SkewTools.heavyHitters(big, "k", 1).collect()(0)
    assert(hh.getLong(0) === 7L && hh.getLong(1) === 900L)
  }

  test("distinctApprox (HLL) within rsd; queryAs typed surface; $text $field") {
    val store = new TableStore(spark, sf("orders"), "orders", "o_orderkey", "o_orderdate")
    val exact = store.distinct("o_custkey").count()
    val approx = store.distinctApprox("o_custkey", rsd = 0.02)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
    val s = spark; import s.implicits._
    val ds = store.queryAs[KeyPrice](QueryParams(
      properties = Seq("o_orderkey", "o_totalprice"), limit = Some(5)))
    assert(ds.collect().length === 5)
    // $text over a configurable column
    val docs = new TableStore(spark, sf("documents"), "docs", "doc_id")
    val n = docs.count(Some("""{"$text": {"$search": "spark", "$field": "text"}}"""))
    assert(n > 0)
  }

  test("$text compound: phrase containment, $mustNot exclusion, null-field semantics") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "quick and brown but not adjacent fox"),
      (3L, "the quick brown dog barks"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    def ids(crit: String): Set[Long] =
      graft.query.MongoFilter(df, crit).collect().map(_.getLong(0)).toSet
    // quoted phrase = contiguous containment: doc 2 has both tokens but
    // not the phrase
    assert(ids("""{"$text": {"$search": "\"quick brown\""}}""") === Set(1L, 3L))
    // mustNot excludes; a null text field satisfies mustNot but fails must
    assert(ids("""{"$text": {"$search": "\"quick brown\"", "$mustNot": "barks"}}""")
      === Set(1L))
    // array form: any listed clause excludes
    assert(ids("""{"$text": {"$search": "quick", "$mustNot": ["barks", "fox"]}}""")
      === Set.empty[Long])
    // mustNot alone never matches null-text docs via must (empty must =
    // true), so doc 4 DOES match a pure-exclusion search
    assert(ids("""{"$text": {"$search": "", "$mustNot": "quick"}}""") === Set(4L))
  }

  test("semanticDupPairs hot-cell cap: star emits O(cell) pairs and keeps the cluster connected") {
    val s = spark; import s.implicits._
    // 22 near-identical vectors -> one degenerate cell far above the cap.
    // Uncapped, the within-cell self-join would emit 231 pairs (O(cell²));
    // star mode must emit exactly cell-1 = 21, all from the min-id rep.
    val corpus = (1L to 22L)
      .map(i => (i, Seq(1.0f, 0.001f * i, 0.0f)))
      .toDF("vec_id", "embedding")
    val star = graft.ext.Similarity.semanticDupPairs(corpus, nCentroids = 1,
      threshold = 0.95, maxCellSize = 5, overCap = "star").collect()
    assert(star.length === 21)
    assert(star.forall(_.getAs[Long]("a") === 1L))
    // star keeps the over-cap cluster connected: one canonical survives
    val pairs = graft.ext.Similarity.semanticDupPairs(corpus, nCentroids = 1,
      threshold = 0.95, maxCellSize = 5, overCap = "star")
    val kept = graft.ext.Dedup.keepCanonical(corpus, pairs, "vec_id")
    assert(kept.select("vec_id").as[Long].collect().toSeq === Seq(1L))
    // drop mode: the over-cap cell contributes nothing
    val dropped = graft.ext.Similarity.semanticDupPairs(corpus, nCentroids = 1,
      threshold = 0.95, maxCellSize = 5, overCap = "drop")
    assert(dropped.count() === 0)
  }

  test("asofJoin: greatest right ts <= left ts per key, >= on exact ties, null when none") {
    val s = spark; import s.implicits._
    val ts = (m: Long) => new java.sql.Timestamp(m)
    val left = Seq((1L, 10L, ts(100)), (2L, 10L, ts(250)), (3L, 10L, ts(50)),
      (4L, 20L, ts(500))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, 10L, ts(100)), (101L, 10L, ts(200)),
      (102L, 30L, ts(10))).toDF("rid", "user_id", "ts")
    val out = graft.ext.TemporalJoins.asofJoin(left, right, Seq("user_id"), "ts",
      Map("matched" -> "rid")).orderBy("event_id").collect()
    assert(out.map(r => Option(r.getAs[Any]("matched"))).toSeq ===
      Seq(Some(100L), Some(101L), None, None))
    // forward: smallest right ts >= left ts (inclusive on exact ties)
    val fwd = graft.ext.TemporalJoins.asofJoin(left, right, Seq("user_id"), "ts",
      Map("matched" -> "rid"), direction = "forward")
      .orderBy("event_id").collect()
    assert(fwd.map(r => Option(r.getAs[Any]("matched"))).toSeq ===
      Seq(Some(100L), None, Some(100L), None))
    // tolerance: the event at 250 matched rid 101 (ts 200) at distance
    // 50ms — a 40ms tolerance nulls it; the exact-tie match survives
    val tol = graft.ext.TemporalJoins.asofJoin(left, right, Seq("user_id"), "ts",
      Map("matched" -> "rid"), toleranceMs = Some(40L))
      .orderBy("event_id").collect()
    assert(tol.map(r => Option(r.getAs[Any]("matched"))).toSeq ===
      Seq(Some(100L), None, None, None))
  }

  test("rangeJoinCount equals the naive theta-join") {
    val s = spark; import s.implicits._
    val ts = (m: Long) => new java.sql.Timestamp(m)
    val left = Seq((1L, ts(0)), (2L, ts(1000)), (3L, ts(5000))).toDF("k", "lts")
    val right = Seq(ts(0), ts(400), ts(999), ts(1000), ts(1500), ts(6000)).toDF("rts")
    val banded = graft.ext.TemporalJoins.rangeJoinCount(left, "lts", right, "rts",
      windowMs = 1000L, lKeyCols = Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // [0,1000): 3 events; [1000,2000): 2; [5000,6000): 0 (absent)
    assert(banded === Map(1L -> 3L, 2L -> 2L))
  }

  test("skew gate counters: the 10%-hot exact-dedup reduce stage is map-side combined (VERDICT r14 #7)") {
    // the listener-measured per-task shuffle rows of the skew row's
    // heaviest reduce stage: with partial min_by the hot hash ships at
    // most one pre-reduced row per map task, so the max/median ratio
    // stays O(1); a windowed regression would put the whole 10% mass on
    // one task (ratio ~ 0.1·N / (0.9·N/32) ≈ 3.5+ already at sf0.001,
    // growing with parallelism·skew at scale)
    val (tasks, maxRows, medRows) =
      SparkEntry.skewGateCounters(spark, "/root/testdata/sf0.001")
    assert(tasks > 0, "reduce stage must be observed")
    assert(medRows > 0)
    val ratio = maxRows.toDouble / medRows
    assert(ratio <= 8.0,
      s"hot-task skew detected: max=$maxRows median=$medRows ratio=$ratio")
  }
}