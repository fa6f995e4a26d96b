package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Native codegen vector kernels vs the HOF reference implementation. */
class VectorExpressionSpec extends SparkSpec {

  test("graft_dot / graft_cosine match the HOF fold on float arrays") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.5f, -1.5f, 2.25f), Array(-2.0f, 0.25f, 8.0f))
    ).toDF("id", "a", "b")
    val rows = df.select(
      GraftFunctions.dot(spark, col("a"), col("b")).alias("nd"),
      graft.ext.Similarity.dot(col("a"), col("b")).alias("hd"),
      GraftFunctions.cosine(spark, col("a"), col("b")).alias("nc"),
      graft.ext.Similarity.cosine(col("a"), col("b")).alias("hc")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-12)
    }
  }

  test("graft_cosine: zero vector -> null; null input -> null; SQL-callable") {
    val s = spark; import s.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Some(Array(0.0, 0.0)), Some(Array(1.0, 2.0))),
      (2L, None: Option[Array[Double]], Some(Array(1.0, 2.0))),
      (3L, Some(Array(3.0, 4.0)), Some(Array(3.0, 4.0)))
    ).toDF("id", "a", "b")
    df.createOrReplaceTempView("vecs")
    val out = spark.sql(
      "SELECT id, graft_cosine(a, b) AS c FROM vecs ORDER BY id").collect()
    assert(out(0).isNullAt(1) && out(1).isNullAt(1))
    assert(math.abs(out(2).getDouble(1) - 1.0) < 1e-12)
  }

  test("interpreted eval path agrees with codegen (direct Expression eval)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val mk = (vs: Seq[Double]) =>
      Literal(ArrayData.toArrayData(vs.toArray), ArrayType(DoubleType))
    val e = graft.functions.CosineSimilarity(mk(Seq(1, 0, 1)), mk(Seq(1, 1, 0)))
    val v = e.eval(null).asInstanceOf[Double]
    assert(math.abs(v - 0.5) < 1e-12)
  }

  test("zlib/gzip codec expressions round-trip binary payloads") {
    val s = spark; import s.implicits._
    GraftFunctions.register(spark)
    val df = Seq("hello graft " * 50, "").toDF("t")
      .selectExpr("cast(t as binary) AS b")
    val out = df.selectExpr(
      "zlib_inflate(zlib_deflate(b)) AS z",
      "gzip_decompress(gzip_compress(b)) AS g",
      "length(zlib_deflate(b)) AS zlen", "length(b) AS blen").collect()
    assert(new String(out(0).getAs[Array[Byte]]("z")) === "hello graft " * 50)
    assert(new String(out(0).getAs[Array[Byte]]("g")) === "hello graft " * 50)
    assert(out(0).getAs[Int]("zlen") < out(0).getAs[Int]("blen")) // it compresses
    assert(out(1).getAs[Array[Byte]]("z").length === 0)
  }

  test("MinHashAgg sketch: partition-invariant, componentwise-min semantics") {
    val s = spark; import s.implicits._
    GraftFunctions.register(spark)
    val rows = (1 to 200).map(i => (i % 5L, s"shingle-$i"))
    val df1 = rows.toDF("id", "sh").repartition(1)
    val df8 = rows.toDF("id", "sh").repartition(8)
    def sigs(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("id").agg(expr("graft_minhash(sh, 16)").alias("sig"))
        .orderBy("id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val a = sigs(df1); val b = sigs(df8)
    assert(a === b)                      // merge is order/partition invariant
    assert(a(0L).length === 16)
    // componentwise: sketch of a superset is <= elementwise
    val sup = ((1 to 200) ++ (201 to 300)).map(i => (0L, s"shingle-$i")).toDF("id", "sh")
    val supSig = sigs(sup)(0L)
    val baseAll = sigs(rows.map(r => (0L, r._2)).toDF("id", "sh"))(0L)
    supSig.zip(baseAll).foreach { case (x, y) => assert(x <= y) }
  }
  test("BoundedCollectAgg: capped posting lists, NULL on overflow, partition-invariant") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // key 1: 3 postings (under cap); key 2: 12 postings (over cap of 10)
    val rows = (1L to 3L).map(i => (1L, i, 100L + i)) ++
      (1L to 12L).map(i => (2L, i, 200L + i))
    // many partitions force partial-buffer merges, incl. merged overflow
    val df = rows.toDF("k", "id", "aux").repartition(8)
    val out = df.groupBy(col("k"))
      .agg(graft.functions.BoundedCollectAgg.boundedCollect(s, col("id"), col("aux"), 10).alias("lst"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[org.apache.spark.sql.Row](1))).toMap
    assert(out(2L) === None) // hot key -> NULL
    val got = out(1L).get.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got === Seq((1L, 101L), (2L, 102L), (3L, 103L)))
    // exactly-at-cap group survives with all entries
    val atCap = (1L to 10L).map(i => (9L, i, i)).toDF("k", "id", "aux").repartition(5)
      .groupBy(col("k"))
      .agg(graft.functions.BoundedCollectAgg.boundedCollect(s, col("id"), col("aux"), 10).alias("lst"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](1)
    assert(atCap.size === 10)
  }

}