package graft

import graft.query.QueryParams
import graft.store.{JsonStore, MemoryStore, TableStore}
import graft.store.views._
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

/** JsonStore fixture shapes (FIXTURES.md §1 / reference
  * `tests/stores/test_mongolike.py:56-127`) + view-store write paths. */
class JsonViewsSpec extends SparkSpec {

  test("JsonStore: BSON extended JSON — $oid string, $date timestamp (mongolike.py:719)") {
    val dir = Files.createTempDirectory("json").toString
    Files.writeString(Paths.get(s"$dir/ext.json"),
      """[{"_id": {"$oid": "64f1deadbeefdeadbeefdead"}, "task_id": 1,
        |  "last_updated": {"$date": "2024-06-01T12:30:00Z"}, "v": "x"}]""".stripMargin)
    val st = new JsonStore(spark, Seq(s"$dir/ext.json"), key = "task_id")
    val row = st.df.collect()(0)
    assert(row.getAs[String]("_id") === "64f1deadbeefdeadbeefdead")
    assert(row.getAs[java.sql.Timestamp]("last_updated") ===
      java.sql.Timestamp.from(java.time.Instant.parse("2024-06-01T12:30:00Z")))
  }

  test("JsonStore: heterogeneous docs merge — absent keys null, arrays kept (d.json shape)") {
    val dir = Files.createTempDirectory("json2").toString
    Files.writeString(Paths.get(s"$dir/d.json"),
      """[{"a": 1, "b": [10, 20], "task_id": 0},
        | {"a": 5, "b": [0, 1], "c": "hello", "task_id": 1}]""".stripMargin)
    val st = new JsonStore(spark, Seq(s"$dir/d.json"), key = "task_id")
    assert(st.df.schema("c").dataType.typeName === "string")
    assert(st.query("""{"c": {"$exists": false}}""").count() === 1)
    assert(st.query("""{"b": 10}""").count() === 1)  // array containment
    // distinct over array field unravels (mongolike.py:176-181)
    assert(st.distinct("b").count() === 4)
  }

  test("JsonStore: gzipped JSONL (c.json.gz shape)") {
    val dir = Files.createTempDirectory("json3").toString
    val out = new GZIPOutputStream(new java.io.FileOutputStream(s"$dir/c.jsonl.gz"))
    out.write("{\"task_id\": 1, \"v\": 10}\n{\"task_id\": 2, \"v\": 20}\n".getBytes)
    out.close()
    val st = new JsonStore(spark, Seq(s"$dir/c.jsonl.gz"), key = "task_id", multiLine = false)
    assert(st.count() === 2)
    assert(st.query("""{"v": {"$gte": 15}}""").collect()(0).getAs[Long]("task_id") === 2)
  }

  test("AliasingStore: criteria/props in external names; writes reverse-map (advanced_stores.py:242-320)") {
    val s = spark; import s.implicits._
    val inner = new MemoryStore(spark, "inner", key = "task_id", lastUpdatedField = "lu")
    inner.load(Seq((1L, "x", 10), (2L, "y", 20)).toDF("task_id", "internal_name", "internal_val"))
    val aliased = new AliasingStore(inner,
      Map("nm" -> "internal_name", "vl" -> "internal_val"))
    assert(aliased.df.columns.toSet === Set("task_id", "nm", "vl"))
    val r = aliased.query(QueryParams(criteria = Some("""{"vl": {"$gt": 15}}"""),
      properties = Seq("task_id", "nm")))
    assert(r.collect()(0).getAs[String]("nm") === "y")
    // write with external names lands internally
    aliased.update(Seq((3L, "z", 30)).toDF("task_id", "nm", "vl"))
    assert(inner.query("""{"internal_name": "z"}""").count() === 1)
  }

  test("AliasingStore: aliased key surfaces externally; deletes rewrite keys not values") {
    val s = spark; import s.implicits._
    val inner = new MemoryStore(spark, "inner2", key = "task_id", lastUpdatedField = "ts")
    inner.load(Seq((1L, "type", 10), (2L, "other", 20))
      .toDF("task_id", "label", "internal_val"))
    val aliased = new AliasingStore(inner,
      Map("task" -> "task_id", "type" -> "internal_val"))
    // the contract fields speak external names, like every read
    assert(aliased.key === "task")
    assert(aliased.df.columns.contains("task"))
    // criteria VALUE "type" must not be rewritten to the internal name
    // of the aliased FIELD "type" (string replace would delete doc 1)
    aliased.removeDocs("""{"label": "type"}""")
    assert(inner.df.count() === 1)
    assert(inner.df.select("task_id").collect()(0).getLong(0) === 2L)
    // removeKeys arrives under the external key name
    aliased.removeKeys(Seq(2L).toDF("task"))
    assert(inner.df.count() === 0)
  }

  test("SandboxStore: deletes are sandbox-scoped (cannot touch other sandboxes)") {
    val s = spark; import s.implicits._
    val inner = new MemoryStore(spark, "innersb", key = "task_id")
    inner.load(Seq(
      (1L, Seq("core"), "a"), (2L, Seq("other"), "a"), (3L, null, "a")
    ).toDF("task_id", "sbxn", "v"))
    val core = new SandboxStore(inner, "core")
    // criteria matches ALL docs, but only sandbox-visible ones (1, 3) go
    core.removeDocs("""{"v": "a"}""")
    assert(inner.df.select("task_id").collect().map(_.getLong(0)).toSet === Set(2L))
    // removeKeys equally scoped: key 2 belongs to another sandbox
    inner.load(Seq((1L, Seq("core"), "a"), (2L, Seq("other"), "a"))
      .toDF("task_id", "sbxn", "v"))
    core.removeKeys(Seq(1L, 2L).toDF("task_id"))
    assert(inner.df.select("task_id").collect().map(_.getLong(0)).toSet === Set(2L))
  }

  test("JointStore overwrites lastUpdatedField in place (non-main updates visible)") {
    val s = spark; import s.implicits._
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    val main = new TableStore(s, Seq((1L, "m", t1)).toDF("k", "mv", "last_updated"),
      "main", "k")
    val other = new TableStore(s, Seq((1L, "o", t2)).toDF("k", "ov", "last_updated"),
      "other", "k")
    val j = new JointStore(main, Seq("oth" -> other))
    // reference semantics (compound_stores.py:201-204): the ORIGINAL field
    // name carries the combined max — no synthetic column
    assert(j.lastUpdatedField === "last_updated")
    assert(j.lastUpdated === Some(t2))
    // criteria on the original field name see the combined value
    assert(j.count(Some("""{"last_updated": {"$gt": "2024-01-15T00:00:00"}}""")) === 1L)
  }

  test("SandboxStore: predicate injection + write tagging (advanced_stores.py:422-507)") {
    val s = spark; import s.implicits._
    val inner = new MemoryStore(spark, "inner", key = "task_id")
    inner.load(Seq(
      (1L, Seq("core")), (2L, Seq("other")), (3L, null)
    ).toDF("task_id", "sbxn"))
    val core = new SandboxStore(inner, "core")
    assert(core.df.select("task_id").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    val exclusive = new SandboxStore(inner, "core", exclusive = true)
    assert(exclusive.df.count() === 1)
    // writes are tagged with the sandbox (array_union)
    core.update(Seq((4L, null: Seq[String])).toDF("task_id", "sbxn"))
    val tag = inner.query("""{"task_id": 4}""").collect()(0)
      .getAs[scala.collection.Seq[String]]("sbxn")
    assert(tag.toSeq === Seq("core"))
  }

  test("JointStore nested mode: struct column per store + greatest-lu (compound_stores.py:148-218)") {
    val s = spark; import s.implicits._
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    val main = new TableStore(s, Seq((1L, "m1", t1)).toDF("k", "mv", "last_updated"),
      "main", "k")
    val other = new TableStore(s, Seq((1L, "o1", t2)).toDF("k", "ov", "last_updated"),
      "other", "k")
    val j = new JointStore(main, Seq("oth" -> other))
    val row = j.df.collect()(0)
    assert(row.getAs[org.apache.spark.sql.Row]("oth").getAs[String]("ov") === "o1")
    assert(row.getAs[java.sql.Timestamp]("last_updated") === t2)
  }

  test("JsonStore writable: update/remove persist durably across reopen") {
    val dir = Files.createTempDirectory("jsonw").toString
    Files.writeString(Paths.get(s"$dir/a.json"),
      """[{"task_id": 1, "v": "x"}, {"task_id": 2, "v": "y"}]""")
    val s = spark; import s.implicits._
    val st = new JsonStore(spark, Seq(s"$dir/a.json"), key = "task_id", readOnly = false)
    st.update(Seq((2L, "y2"), (3L, "z")).toDF("task_id", "v"))
    st.removeDocs("""{"task_id": 1}""")
    // reopen from disk: writes must survive the instance
    val st2 = new JsonStore(spark, Seq(s"$dir/a.json"), key = "task_id", readOnly = false)
    assert(st2.count() === 2)
    assert(st2.query("""{"task_id": 2}""").collect()(0).getAs[String]("v") === "y2")
  }

  test("JsonStore writable: timestamp types survive overlay reopen (lastUpdated path)") {
    val dir = Files.createTempDirectory("jsonts").toString
    Files.writeString(Paths.get(s"$dir/t.json"),
      """[{"task_id": 1, "last_updated": {"$date": "2026-01-02T03:04:05Z"}},
        | {"task_id": 2, "last_updated": {"$date": "2026-02-03T04:05:06Z"}}]""".stripMargin)
    val s = spark; import s.implicits._
    val st = new JsonStore(spark, Seq(s"$dir/t.json"), key = "task_id", readOnly = false)
    assert(st.df.schema("last_updated").dataType.typeName === "timestamp")
    st.update(Seq((3L, new java.sql.Timestamp(1767343446000L)))
      .toDF("task_id", "last_updated"))
    // reopen: the overlay's schema sidecar must restore timestamp typing,
    // or lastUpdated's Timestamp cast would throw on the re-inferred string
    val st2 = new JsonStore(spark, Seq(s"$dir/t.json"), key = "task_id", readOnly = false)
    assert(st2.df.schema("last_updated").dataType.typeName === "timestamp")
    assert(st2.lastUpdated.nonEmpty && st2.count() === 3)
  }

  test("missing-field semantics: {missing: null} matches all, positive ops none, negative all") {
    val s = spark; import s.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    import graft.query.MongoFilter
    assert(MongoFilter(df, """{"nope": null}""").count() === 2)
    assert(MongoFilter(df, """{"nope": "x"}""").count() === 0)
    assert(MongoFilter(df, """{"nope": {"$gt": 5}}""").count() === 0)
    assert(MongoFilter(df, """{"nope": {"$ne": "x"}}""").count() === 2)
    assert(MongoFilter(df, """{"nope": {"$nin": ["x"]}}""").count() === 2)
  }

  test("$ne / $nin on array fields: containment-negation incl. null arrays") {
    val s = spark; import s.implicits._
    val df = Seq((1, Seq("a", "b")), (2, Seq("c")), (3, null)).toDF("k", "tags")
    import graft.query.MongoFilter
    assert(MongoFilter(df, """{"tags": {"$ne": "a"}}""")
      .select("k").collect().map(_.getInt(0)).toSet === Set(2, 3))
    assert(MongoFilter(df, """{"tags": {"$nin": ["a", "c"]}}""")
      .select("k").collect().map(_.getInt(0)).toSet === Set(3))
  }
}