package graft

import graft.query.QueryParams
import graft.store.{MemoryStore, ParquetStore, TableStore}
import org.apache.spark.sql.functions._

/** Store-surface assertions mirroring `tests/stores/test_mongolike.py`
  * (query/count/distinct/groupby/update-upsert/remove/newer_in). */
class StoreSpec extends SparkSpec {

  private def mkStore(key: String = "k"): MemoryStore = {
    val s = spark; import s.implicits._
    val st = new MemoryStore(spark, key = key, lastUpdatedField = "lu")
    st.load(Seq(
      (0L, "a", 1.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, "b", 2.0, java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),
      (2L, "a", 3.0, java.sql.Timestamp.valueOf("2024-01-03 00:00:00")),
      (3L, "c", 4.0, java.sql.Timestamp.valueOf("2024-01-04 00:00:00"))
    ).toDF("k", "d", "v", "lu"))
    st
  }

  test("query: criteria + projection + sort + limit") {
    val st = mkStore()
    val out = st.query(QueryParams(
      criteria = Some("""{"v": {"$gt": 1.5}}"""),
      properties = Seq("k", "d"), sort = Seq("k" -> -1), limit = Some(2)))
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(3L, 2L))
  }

  test("queryOne / count") {
    val st = mkStore()
    assert(st.count() === 4)
    assert(st.count(Some("""{"d": "a"}""")) === 2)
    assert(st.queryOne(QueryParams(sort = Seq("k" -> 1))).get.getLong(0) === 0L)
  }

  test("distinct incl. missing field → empty") {
    val st = mkStore()
    assert(st.distinct("d").collect().map(_.getString(0)).sorted.toSeq === Seq("a", "b", "c"))
    assert(st.distinct("d", Some("""{"v": {"$lt": 2.5}}""")).count() === 2)
  }

  test("distinct unravels array fields (mongolike.py:176-181)") {
    val s = spark; import s.implicits._
    val st = new MemoryStore(spark, key = "k")
    st.load(Seq((1L, Seq("mp-0", "mp-1")), (2L, Seq("mp-1", "mp-2"))).toDF("k", "ids"))
    assert(st.distinct("ids").count() === 3)
  }

  test("groupby returns key + docs array (sizes 2/1/1)") {
    val st = mkStore()
    val g = st.groupby(Seq("d")).collect()
    assert(g.length === 3)
    val sizes = g.map(r => r.getString(0) -> r.getSeq[Any](1).size).toMap
    assert(sizes === Map("a" -> 2, "b" -> 1, "c" -> 1))
  }

  test("distinct on array fields keeps null-valued docs (explode_outer)") {
    val s = spark; import s.implicits._
    val st = new MemoryStore(spark, "dn", key = "k")
    st.load(Seq((1L, Seq("a", "b")), (2L, null)).toDF("k", "f"))
    val vals = st.distinct("f").collect().map(r =>
      Option(r.getString(0)).getOrElse("<null>")).toSet
    assert(vals === Set("a", "b", "<null>"))
  }

  test("groupby with dot-path properties references the projected flat names") {
    val s = spark; import s.implicits._
    val st = new MemoryStore(spark, "gp", key = "k")
    st.load(Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 30L)).toDF("k", "g", "n")
      .select(col("k"), col("g"), struct(col("n").alias("x")).alias("nested")))
    val grouped = st.groupby(Seq("g"), properties = Seq("nested.x", "k"))
      .orderBy("g").collect()
    assert(grouped.length === 2)
    val docs = grouped(0).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("docs")
    assert(docs.size === 2)
    // projected dotted property surfaces under its flat alias; docs
    // carry properties ∪ group keys (reference $project shape)
    assert(docs.head.schema.fieldNames.toSet === Set("nested_x", "k", "g"))
  }

  test("update = upsert by key; last-write-wins within batch") {
    val s = spark; import s.implicits._
    val st = mkStore()
    st.update(Seq(
      (1L, "B", 20.0, java.sql.Timestamp.valueOf("2024-02-01 00:00:00")),
      (9L, "z", 9.0, java.sql.Timestamp.valueOf("2024-02-01 00:00:00")),
      (9L, "zz", 99.0, java.sql.Timestamp.valueOf("2024-02-02 00:00:00"))
    ).toDF("k", "d", "v", "lu"))
    assert(st.count() === 5)
    assert(st.query("""{"k": 1}""").collect()(0).getAs[String]("d") === "B")
    assert(st.query("""{"k": 9}""").collect()(0).getAs[String]("d") === "zz")
  }

  test("update with compound key (test_mongolike.py:130-159)") {
    val s = spark; import s.implicits._
    val st = mkStore()
    st.update(Seq((0L, "a", 100.0, java.sql.Timestamp.valueOf("2024-03-01 00:00:00")))
      .toDF("k", "d", "v", "lu"), keyFields = Seq("k", "d"))
    assert(st.count() === 4)
    assert(st.query("""{"k": 0}""").collect()(0).getAs[Double]("v") === 100.0)
  }

  test("removeDocs keeps non-matching incl. null-predicate rows") {
    val st = mkStore()
    st.removeDocs("""{"d": "a"}""")
    assert(st.count() === 2)
  }

  test("lastUpdated = max(lu)") {
    val st = mkStore()
    assert(st.lastUpdated.get === java.sql.Timestamp.valueOf("2024-01-04 00:00:00"))
  }

  test("newerIn exhaustive: new + updated keys (core/store.py:239-275)") {
    val s = spark; import s.implicits._
    val src = mkStore()
    val tgt = new MemoryStore(spark, key = "k", lastUpdatedField = "lu")
    tgt.load(Seq(
      (0L, "a", 1.0, java.sql.Timestamp.valueOf("2024-05-01 00:00:00")),  // newer
      (1L, "b", 2.0, java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),  // same
      (7L, "n", 7.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))   // new key
    ).toDF("k", "d", "v", "lu"))
    val delta = src.newerIn(tgt).collect().map(_.getLong(0)).sorted
    assert(delta.toSeq === Seq(0L, 7L))
    // fast path: max(src.lu)=01-04 → only key 0 (05-01) qualifies
    val fast = src.newerIn(tgt, exhaustive = false).collect().map(_.getLong(0))
    assert(fast.toSeq === Seq(0L))
  }

  test("ParquetStore: durable upsert + removeKeys round-trip") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    val st = new ParquetStore(spark, dir, key = "k", lastUpdatedField = "lu")
    assert(st.isEmpty)
    st.update(Seq((1L, "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k", "d", "lu"))
    st.update(Seq(
      (1L, "x2", java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),
      (2L, "y", java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))).toDF("k", "d", "lu"))
    assert(st.count() === 2)
    assert(st.query("""{"k": 1}""").collect()(0).getAs[String]("d") === "x2")
    st.removeKeys(Seq(1L).toDF("k"))
    assert(st.count() === 1)
    // fresh handle sees the committed version
    val st2 = new ParquetStore(spark, dir, key = "k", lastUpdatedField = "lu")
    assert(st2.count() === 1)
  }

  test("updateRemoveKeys: fused remove+upsert == the two-call sequence, ONE version flip") {
    val s = spark; import s.implicits._
    // ParquetStore, compound-key upsert (the lu-update builder shape):
    // remove doc 1's rows and upsert a batch re-stating doc 1 + adding
    // doc 3 — compare against the sequential reference contents
    def seed(st: ParquetStore): Unit =
      st.update(Seq((1L, "a", 2L), (1L, "b", 1L), (2L, "a", 5L))
        .toDF("id", "tok", "cnt"), Seq("id", "tok"))
    val batch = Seq((1L, "c", 7L), (3L, "a", 9L)).toDF("id", "tok", "cnt")
    val removals = Seq(1L).toDF("id")
    val d1 = java.nio.file.Files.createTempDirectory("graft-urk1").toString
    val fused = new ParquetStore(spark, d1, key = "id", lastUpdatedField = "cnt")
    seed(fused)
    val vBefore = fused.contentToken
    fused.updateRemoveKeys(batch, removals, Seq("id", "tok"))
    // exactly one committed version flip (v_n -> v_{n+1})
    assert(fused.contentToken === "v_" + (vBefore.drop(2).toLong + 1))
    val d2 = java.nio.file.Files.createTempDirectory("graft-urk2").toString
    val seq2 = new ParquetStore(spark, d2, key = "id", lastUpdatedField = "cnt")
    seed(seq2)
    seq2.removeKeys(removals)
    seq2.update(batch, Seq("id", "tok"))
    def contents(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "tok", "cnt").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(contents(fused.df) === contents(seq2.df))
    assert(contents(fused.df) ===
      Set((1L, "c", 7L), (2L, "a", 5L), (3L, "a", 9L)))
    // MemoryStore: same fused contract, one checkpointed plan
    val m = new MemoryStore(spark, key = "id")
    m.update(Seq((1L, "a", 2L), (1L, "b", 1L), (2L, "a", 5L))
      .toDF("id", "tok", "cnt"), Seq("id", "tok"))
    m.updateRemoveKeys(batch, removals, Seq("id", "tok"))
    assert(contents(m.df) === contents(fused.df))
    // empty-store degenerate: behaves as a plain update
    val d3 = java.nio.file.Files.createTempDirectory("graft-urk3").toString
    val e = new ParquetStore(spark, d3, key = "id", lastUpdatedField = "cnt")
    e.updateRemoveKeys(batch, removals, Seq("id", "tok"))
    assert(contents(e.df) === Set((1L, "c", 7L), (3L, "a", 9L)))
  }

  test("ParquetStore deltaWrites: O(batch) upserts, merge-on-read last-wins, compaction") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mor").toString
    def dirs() = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.startsWith("v_")).sorted.toSeq
    val st = new ParquetStore(spark, dir, key = "k", lastUpdatedField = "lu",
      deltaWrites = true, compactAfter = 2)
    st.update(Seq((1L, "a"), (2L, "b")).toDF("k", "d"))
    assert(dirs() === Seq("v_0")) // first write is a plain base
    // delta 1: restate key 2, add key 3 — base dir untouched, only the
    // batch is written
    st.update(Seq((2L, "b2"), (3L, "c")).toDF("k", "d"))
    assert(dirs() === Seq("v_0", "v_0.d_1"))
    assert(spark.read.parquet(s"$dir/v_0.d_1").count() === 2) // O(batch)
    assert(spark.read.parquet(s"$dir/v_0").count() === 2)     // base as-was
    // merge-on-read: later generation wins per key
    val rows = st.df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows === Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    assert(st.count() === 3) // delta-aware count (footer path would say 4)
    // a fresh handle reads the same manifest
    assert(new ParquetStore(spark, dir, key = "k", deltaWrites = true)
      .count() === 3)
    // delta 2 hits compactAfter=2 → fold to one base
    st.update(Seq((1L, "a3")).toDF("k", "d"))
    assert(dirs() === Seq("v_0", "v_0.d_1", "v_0.d_2", "v_1") || dirs() === Seq("v_1"),
      s"unexpected layout ${dirs()}")
    assert(st.contentToken === "v_1") // manifest reset, no pending deltas
    val after = st.df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after === Map(1L -> "a3", 2L -> "b2", 3L -> "c"))
    // delete paths compact-first (full rewrite semantics preserved)
    st.update(Seq((4L, "d")).toDF("k", "d")) // v_1.d_1
    st.removeKeys(Seq(2L).toDF("k"))
    assert(st.contentToken === "v_2")
    assert(st.df.select("k").collect().map(_.getLong(0)).sorted === Array(1L, 3L, 4L))
  }

  test("TableStore over TESTDATA parquet") {
    val st = TableStore.parquet(spark, "/root/testdata/sf0.001/orders.parquet",
      key = "o_orderkey", lastUpdated = "o_orderdate")
    assert(st.count(Some("""{"o_totalprice": {"$gt": 100000}}""")) > 0)
    assert(st.distinct("o_orderstatus").count() <= 3)
  }

  test("groupby parity params: properties/sort/skip/limit fold before grouping (core/store.py:147-172)") {
    val st = mkStore()
    // sort by k asc, skip 1, limit 2 → docs k=1 (d=b), k=2 (d=a)
    val g = st.groupby(Seq("d"), sort = Seq("k" -> 1), skip = 1,
      limit = Some(2), properties = Seq("v"))
    val rows = g.collect()
    val sizes = rows.map(r => r.getString(0) -> r.getSeq[Any](1).size).toMap
    assert(sizes === Map("a" -> 1, "b" -> 1))
    // projected docs carry properties ∪ keys (mongolike.py:219-221)
    val docFields = g.schema("docs").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSet
    assert(docFields === Set("v", "d"))
    // reference cardinalities (test_mongolike.py:162-180)
    val s = spark; import s.implicits._
    val st2 = new MemoryStore(spark, key = "f")
    st2.load(Seq((7L, 9L, 9L), (7L, 9L, 10L), (8L, 9L, 11L), (9L, 10L, 12L))
      .toDF("e", "d", "f"))
    assert(st2.groupby(Seq("d")).count() === 2)
    assert(st2.groupby(Seq("e", "d")).count() === 3)
  }

  test("queryExpr string filter (open_data.py:69-81) + aggregateSql escape hatch (api/resource/aggregation.py)") {
    val st = mkStore()
    assert(st.queryExpr("v > 1.5 AND d = 'a'").collect().map(_.getLong(0)).toSeq === Seq(2L))
    val agg = st.aggregateSql("SELECT d, count(*) AS n FROM docs GROUP BY d ORDER BY d")
    assert(agg.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 2L), ("b", 1L), ("c", 1L)))
  }

  test("ParquetStore no-criteria count is footer-metadata only (zero Spark jobs)") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cnt").toString
    val st = new ParquetStore(spark, dir, key = "k")
    st.update(Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "d"))
    Thread.sleep(300) // let the update's job events drain
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).toSet
    assert(st.count() === 3)
    Thread.sleep(500) // listener-bus drain window before re-reading
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).toSet
    assert(after === before,
      s"footer count must launch no Spark job, saw ${(after -- before).toSeq.sorted}")
    // criteria path still scans and agrees
    assert(st.count(Some("""{"d": {"$ne": "x"}}""")) === 2)
  }
}
