package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** Randomized properties over the operator surface (ScalaCheck's own sbt
  * framework). Each property evaluates a BATCH of generated inputs as one
  * DataFrame, so a run costs a handful of Spark jobs, not hundreds;
  * iteration count is trimmed accordingly. */
object PropertySpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session

  property("zlib and gzip codecs round-trip arbitrary binary payloads") =
    forAll(Gen.nonEmptyListOf(Gen.nonEmptyListOf(
      Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))) { payloads =>
      val s = spark; import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val df = payloads.map(_.toArray).zipWithIndex
        .map { case (b, i) => (i, b) }.toDF("i", "b")
      val rows = df.selectExpr(
        "zlib_inflate(zlib_deflate(b)) AS z",
        "gzip_decompress(gzip_compress(b)) AS g", "b").collect()
      rows.forall { r =>
        java.util.Arrays.equals(r.getAs[Array[Byte]]("z"), r.getAs[Array[Byte]]("b")) &&
        java.util.Arrays.equals(r.getAs[Array[Byte]]("g"), r.getAs[Array[Byte]]("b"))
      }
    }

  property("hashSample and its complement partition any key set at any rate") =
    forAll(Gen.chooseNum(0.0, 1.0), Gen.nonEmptyListOf(Gen.chooseNum(-1000000L, 1000000L))) {
      (rate, keys) =>
        val s = spark; import s.implicits._
        val df = keys.distinct.toDF("k")
        val in = graft.ext.Sampling.hashSample(df, "k", rate)
          .collect().map(_.getLong(0)).toSet
        val out = graft.ext.Sampling.hashSampleComplement(df, "k", rate)
          .collect().map(_.getLong(0)).toSet
        in.intersect(out).isEmpty && (in ++ out) == keys.distinct.toSet
    }

  property("int8 quantization preserves cosine >= 0.98 for bounded vectors") =
    forAll(Gen.nonEmptyListOf(
      Gen.listOfN(16, Gen.chooseNum(-1.0, 1.0)).suchThat(_.exists(x => math.abs(x) > 0.1)))) {
      vecs =>
        val s = spark; import s.implicits._
        val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("vec_id", "embedding")
        val q = graft.ext.Similarity.quantizeI8(df, "embedding")
        val worst = q.select(graft.functions.GraftFunctions.cosine(s,
            col("embedding"),
            graft.ext.Similarity.dequantize(col("q"), col("q_scale"))).alias("c"))
          .agg(min(col("c"))).collect()(0).getDouble(0)
        worst >= 0.98
    }

  property("MongoFilter range/membership criteria equal the native predicate") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L)), Gen.chooseNum(-1000L, 1000L)) {
      (vals, pivot) =>
        val s = spark; import s.implicits._
        val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("k", "v")
        val gt = graft.query.MongoFilter(df, s"""{"v": {"$$gt": $pivot}}""")
          .collect().map(_.getLong(1)).toSeq.sorted
        val nativeGt = vals.filter(_ > pivot).sorted
        val inSet = vals.take(3)
        val innerIn = graft.query.MongoFilter(df,
            s"""{"v": {"$$in": [${inSet.mkString(",")}]}}""")
          .collect().map(_.getLong(1)).toSeq.sorted
        val nativeIn = vals.filter(inSet.contains).sorted
        gt == nativeGt && innerIn == nativeIn
    }
}
