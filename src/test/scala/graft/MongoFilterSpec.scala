package graft

import graft.query.{MongoFilter, QueryParams}

/** Mirrors the reference's criteria-dialect assertions
  * (`tests/stores/test_mongolike.py:81-127`, `query_101.md:113-134`). */
class MongoFilterSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      ("""{"a": 1, "b": 2, "c": 3, "tags": ["x", "y"], "g": {"h": 1}}"""),
      ("""{"a": 4, "b": 5, "c": 6, "tags": ["y", "z"], "g": {"h": 2}}"""),
      ("""{"a": 7, "b": 8, "c": 9, "tags": [], "g": {"h": 1}}"""),
      ("""{"a": null, "b": 11, "c": 12, "g": {"h": 3}}""")
    ).toDF("json")
  }
  private lazy val df = spark.read.json {
    val s = spark; import s.implicits._
    docs.select("json").as[String]
  }

  private def n(criteria: String): Long = MongoFilter(df, criteria).count()

  test("implicit $eq") { assert(n("""{"a": 1}""") === 1) }
  test("$gt/$lt/$gte/$lte") {
    assert(n("""{"a": {"$gt": 1}}""") === 2)
    assert(n("""{"a": {"$gte": 1}}""") === 3)
    assert(n("""{"a": {"$lt": 7}}""") === 2)
    assert(n("""{"b": {"$lte": 5}}""") === 2)
  }
  test("$in/$nin") {
    assert(n("""{"a": {"$in": [1, 7]}}""") === 2)
    assert(n("""{"a": {"$nin": [1, 7]}}""") === 2) // 4 and null-a doc
  }
  test("$ne") { assert(n("""{"a": {"$ne": 1}}""") === 3) }
  test("$exists") {
    assert(n("""{"a": {"$exists": true}}""") === 3)  // null ≠ present (Spark semantics)
    assert(n("""{"zz": {"$exists": false}}""") === 4)
    assert(n("""{"zz": {"$exists": true}}""") === 0)
  }
  test("$and/$or/$not") {
    assert(n("""{"$and": [{"a": {"$gte": 1}}, {"b": {"$lt": 8}}]}""") === 2)
    assert(n("""{"$or": [{"a": 1}, {"a": 7}]}""") === 2)
    assert(n("""{"$not": {"a": 1}}""") === 3)
  }
  test("dot-path nested fields") {
    assert(n("""{"g.h": 1}""") === 2)
    assert(n("""{"g.h": {"$gt": 2}}""") === 1)
  }
  test("array containment equality + $size + $all") {
    assert(n("""{"tags": "y"}""") === 2)
    assert(n("""{"tags": {"$size": 0}}""") === 1)
    assert(n("""{"tags": {"$all": ["x", "y"]}}""") === 1)
    assert(n("""{"tags": {"$in": ["z", "w"]}}""") === 1)
  }
  test("$regex") { assert(n("""{"tags": {"$size": 2}}""") === 2) }
  test("null equality") { assert(n("""{"a": null}""") === 1) }

  test("$expr $arrayElemAt last element (submission.py:27-31)") {
    val d2 = spark.read.json {
      val s = spark; import s.implicits._
      Seq("""{"state": ["submitted", "running", "done"], "k": 1}""",
          """{"state": ["submitted"], "k": 2}""").toDS
    }
    assert(MongoFilter(d2, """{"$expr": {"$eq": [{"$arrayElemAt": ["$state", -1]}, "done"]}}""").count() === 1)
    assert(MongoFilter(d2, """{"$expr": {"$eq": [{"$arrayElemAt": ["$state", 0]}, "submitted"]}}""").count() === 2)
  }

  test("extended-JSON literal equality: {$date}/{$oid} are values, not operators") {
    val s = spark; import s.implicits._
    val ts = java.sql.Timestamp.from(java.time.Instant.parse("2024-06-01T00:00:00Z"))
    val d = Seq((1L, ts, "64f1deadbeefdeadbeefdead"),
      (2L, java.sql.Timestamp.from(java.time.Instant.parse("2025-01-01T00:00:00Z")), "aa"))
      .toDF("k", "ts", "oid")
    assert(MongoFilter(d, """{"ts": {"$date": "2024-06-01T00:00:00Z"}}""").count() === 1)
    assert(MongoFilter(d, """{"oid": {"$oid": "64f1deadbeefdeadbeefdead"}}""").count() === 1)
  }

  test("$in/$nin with null in the list follow Mongo null semantics") {
    // a=null doc exists; scalar field a over [1,4,7,null]
    assert(n("""{"a": {"$in": [1, null]}}""") === 2)  // 1 and the null doc
    assert(n("""{"a": {"$in": [null]}}""") === 1)
    assert(n("""{"a": {"$nin": [null, 7]}}""") === 2) // 1 and 4; null excluded
    assert(n("""{"a": {"$nin": [7]}}""") === 3)       // 1, 4, and the null doc
  }

  test("absent-field negatives with null operand match nothing (missing ≡ null)") {
    assert(n("""{"m": {"$ne": null}}""") === 0)
    assert(n("""{"m": {"$ne": 5}}""") === 4)
    assert(n("""{"m": {"$nin": [null]}}""") === 0)
    assert(n("""{"m": {"$nin": [5]}}""") === 4)
    assert(n("""{"m": {"$not": {"$eq": null}}}""") === 0)
  }

  test("$elemMatch rejects unsupported $-operators instead of guessing a field") {
    intercept[IllegalArgumentException] {
      n("""{"tags": {"$elemMatch": {"$nin": ["x"]}}}""")
    }
  }

  test("QueryParams canonical fold: match→sort→project→skip→limit") {
    val out = QueryParams(
      criteria = Some("""{"a": {"$gte": 1}}"""),
      properties = Seq("a", "b"),
      sort = Seq("a" -> -1), skip = 1, limit = Some(1))(df)
    val rows = out.collect()
    assert(rows.length === 1)
    assert(out.columns.toSeq === Seq("a", "b"))
    assert(rows(0).getLong(0) === 4) // sorted desc: 7, [skip] 4, 1
  }

  test("filters push down to parquet scan") {
    val li = sf("lineitem")
    val plan = MongoFilter(li, """{"l_quantity": {"$gt": 30}}""")
      .select("l_orderkey").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(l_quantity"))
  }

  test("API operators: validation errors (400 analogues)") {
    import graft.api._
    intercept[ApiError] { new PaginationQuery().query(Map("_limit" -> "5000")) }
    intercept[ApiError] { new PaginationQuery().query(Map("_page" -> "-1")) }
    intercept[ApiError] { new PaginationQuery().query(Map("_page" -> "x")) }
    intercept[ApiError] {
      new SortQuery(allowed = Set("a")).query(Map("_sort_fields" -> "b"))
    }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("n", LongType)))
    intercept[ApiError] { new DynamicQuery(schema).query(Map("n_min" -> "abc")) }
    // defaults: no params -> default page size
    val qp = new PaginationQuery().query(Map.empty)
    assert(qp.limit === Some(100) && qp.skip === 0)
  }
}