package graft

import graft.api.SubmissionStore
import graft.ext.Similarity
import graft.store.MemoryStore
import org.apache.spark.sql.functions._

class SubmissionIvfSpec extends SparkSpec {

  test("SubmissionStore: duplicate rejection, state history append, current state (submission.py)") {
    val s = spark; import s.implicits._
    val inner = new MemoryStore(spark, "subs", key = "submission_id")
    val st = new SubmissionStore(inner, duplicateFields = Seq("formula", "author"))
    val (a1, r1) = st.submit(Seq(("Fe2O3", "ada"), ("NaCl", "grace")).toDF("formula", "author"))
    assert(a1 === 2 && r1 === 0)
    // resubmission of an existing (formula, author) is rejected
    val (a2, r2) = st.submit(Seq(("Fe2O3", "ada"), ("SiC", "ada")).toDF("formula", "author"))
    assert(a2 === 1 && r2 === 1)
    assert(inner.count() === 3)
    // advance state; history appends, current_state = last element
    assert(st.advance("""{"formula": "Fe2O3"}""", "approved") === 1)
    val row = st.withCurrentState.filter(col("formula") === "Fe2O3").collect()(0)
    assert(row.getAs[String]("current_state") === "approved")
    assert(row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("state_history")
      .map(_.getAs[String]("state")).toSeq === Seq("submitted", "approved"))
    // A7: filter on last element of the state array via $expr
    val latest = st.withCurrentState
    assert(graft.query.MongoFilter(latest,
      """{"$expr": {"$eq": [{"$arrayElemAt": ["$state_history.state", -1]}, "approved"]}}""")
      .count() === 1)
  }

  test("ivfTopK finds perturbed twins (recall >= 0.7) with dense correct ranks") {
    val emb = sf("embeddings")
    val twins = emb.filter(col("vec_id") < 20).select(
      (col("vec_id") + 500000).alias("vec_id"),
      expr("transform(embedding, (x, i) -> x + float(0.02 * cos(double(i))))")
        .alias("embedding"), col("label"))
    val corpus = emb.unionByName(twins)
    val queries = emb.filter(col("vec_id") < 20)
    val res = Similarity.ivfTopK(corpus, queries, k = 5, nCentroids = 16, nprobe = 4)
    val hits = res.filter(col("n_id") === col("q_id") + 500000).count()
    assert(hits >= 14, s"IVF found twin for only $hits/20 queries")
    val ranks = res.groupBy("q_id")
      .agg(max("rank").alias("mr"), count(lit(1)).alias("n")).collect()
    ranks.foreach(r => assert(r.getAs[Int]("mr") === r.getAs[Long]("n")))
  }

  test("PQ kernels: exact on codebook-reconstructable vectors; byte codes; determinism") {
    val s = spark; import s.implicits._
    // handcrafted books: m=2 subspaces of dsub=2, ksub=2 centroids each.
    // Vectors that ARE concatenations of centroids must encode to those
    // exact codes, and the ADC cosine must equal the exact cosine (the
    // quantization error term is identically zero).
    val books: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 0.0), Array(0.0, 2.0)),
      Array(Array(3.0, 0.0), Array(0.0, 4.0)))
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 3.0f, 0.0f)), // codes (0, 0)
      (2L, Seq(0.0f, 2.0f, 0.0f, 4.0f)), // codes (1, 1)
      (3L, Seq(1.0f, 0.0f, 0.0f, 4.0f))  // codes (0, 1)
    ).toDF("vec_id", "embedding")
    val enc = corpus.select(col("vec_id"),
      graft.functions.GraftFunctions.pqEncode(s, col("embedding"), books).alias("code"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("code")).toMap
    assert(enc(1L).toSeq === Seq[Byte](0, 0))
    assert(enc(2L).toSeq === Seq[Byte](1, 1))
    assert(enc(3L).toSeq === Seq[Byte](0, 1))
    // ADC cosine vs exact cosine for a query against reconstructable rows
    val queries = Seq((9L, Seq(0.5f, 0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    val adc = Similarity.pqTopKWithBooks(corpus, queries, k = 3, books)
      .select(col("n_id"), col("sim")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .select(col("n_id"), col("sim")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(adc.keySet === exact.keySet)
    adc.foreach { case (id, v) =>
      assert(math.abs(v - exact(id)) < 1e-9, s"ADC $v vs exact ${exact(id)} for $id")
    }
    // determinism: re-encoding yields identical bytes
    val enc2 = corpus.select(
      graft.functions.GraftFunctions.pqEncode(s, col("embedding"), books).alias("code"))
      .collect().map(_.getAs[Array[Byte]]("code").toSeq).toSet
    assert(enc2 === enc.values.map(_.toSeq).toSet)
  }

  test("pqTopK finds perturbed twins on the embeddings fixture (recall >= 0.7)") {
    val emb = sf("embeddings")
    val twins = emb.filter(col("vec_id") < 20).select(
      (col("vec_id") + 500000).alias("vec_id"),
      expr("transform(embedding, (x, i) -> x + float(0.02 * cos(double(i))))")
        .alias("embedding"), col("label"))
    val corpus = emb.unionByName(twins)
    val queries = emb.filter(col("vec_id") < 20)
    // m=8 byte codes over dim 64 (8x compression vs float32, 32x vs
    // float64): the 0.02-perturbed twin reconstructs into the same or a
    // near cell chain, so ADC ranks it at/near the top
    val res = Similarity.pqTopK(corpus, queries, k = 5, m = 8, ksub = 32, iters = 2)
    val hits = res.filter(col("n_id") === col("q_id") + 500000).count()
    assert(hits >= 14, s"PQ found twin for only $hits/20 queries")
    val ranks = res.groupBy("q_id")
      .agg(max("rank").alias("mr"), count(lit(1)).alias("n")).collect()
    ranks.foreach(r => assert(r.getAs[Int]("mr") === r.getAs[Long]("n")))
  }

  test("ivfPqTopK: composed cell routing + in-cell ADC still finds perturbed twins") {
    val emb = sf("embeddings")
    val twins = emb.filter(col("vec_id") < 20).select(
      (col("vec_id") + 500000).alias("vec_id"),
      expr("transform(embedding, (x, i) -> x + float(0.02 * cos(double(i))))")
        .alias("embedding"), col("label"))
    val corpus = emb.unionByName(twins)
    val queries = emb.filter(col("vec_id") < 20)
    val res = Similarity.ivfPqTopK(corpus, queries, k = 5,
      nCentroids = 16, nprobe = 4, m = 8, ksub = 32, iters = 2)
    // two stacked approximations (cell routing AND code quantization):
    // the twin must still surface for most queries, ranks stay dense
    val hits = res.filter(col("n_id") === col("q_id") + 500000).count()
    assert(hits >= 12, s"IVF-PQ found twin for only $hits/20 queries")
    val ranks = res.groupBy("q_id")
      .agg(max("rank").alias("mr"), count(lit(1)).alias("n")).collect()
    ranks.foreach(r => assert(r.getAs[Int]("mr") === r.getAs[Long]("n")))
  }

  test("trainPq ignores dims beyond the sampled seed span (ragged corpus)") {
    // dim derives from the SAMPLED seeds' max length — a corpus vector
    // longer than every seed must not index past the m codes (ANSI
    // element_at error pre-fix); over-length dims carry no codebook
    val emb = sf("embeddings")
    val ragged = emb.withColumn("embedding",
      when(col("vec_id") === 42, concat(col("embedding"),
        array((0 until 16).map(_ => lit(0.5f)): _*))).otherwise(col("embedding")))
    val books = Similarity.trainPq(ragged, m = 8, ksub = 16, iters = 1, family = "md5")
    assert(books.length === 8)
    assert(books.forall(_.length === 16))
  }

  test("PqLut/PqEncode reject an empty inner codebook at analysis, not execution") {
    val s = spark; import s.implicits._
    val badBooks: Array[Array[Array[Double]]] = Array(Array(), Array(Array(1.0)))
    val df = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v")
    val lutEx = intercept[Exception] {
      df.select(graft.functions.GraftFunctions.pqLut(s, col("v"), badBooks)).collect()
    }
    assert(lutEx.getMessage.contains("graft_pq_lut"))
    val encEx = intercept[Exception] {
      df.select(graft.functions.GraftFunctions.pqEncode(s, col("v"), badBooks)).collect()
    }
    assert(encEx.getMessage.contains("graft_pq_encode"))
  }

  test("trainCentroids: Lloyd-trained IVF beats the deterministic draw on clustered data") {
    val s = spark; import s.implicits._
    // 4 tight angular clusters with per-member jitter: the seeded-hash
    // draw routinely lands multiple centroids in one cluster (merging
    // the others' cells); 5 Lloyd rounds pull one centroid to each
    // cluster mean, so nprobe=1 probes the query's own cluster cell
    def v(cl: Int, j: Int): Seq[Float] = Seq.tabulate(8)(d =>
      if (d == cl) 1.0f
      else if (d == 4 + cl) 0.03f * (j % 7)
      else if (d == (cl + 1) % 4) 0.02f * (j % 5)
      else 0.0f)
    val corpus = (for (cl <- 0 until 4; j <- 0 until 30)
      yield ((cl * 100 + j).toLong, v(cl, j))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 100 === 15)
    val truth = Similarity.bruteForceTopK(corpus, queries, 5)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(trainIters: Int): Double = {
      val r = Similarity.ivfTopK(corpus, queries, 5, nCentroids = 4,
        nprobe = 1, trainIters = trainIters)
        .select(col("q_id"), col("n_id")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      r.intersect(truth).size.toDouble / truth.size
    }
    val (untrained, trained) = (recall(0), recall(5))
    info(s"recall untrained=$untrained trained=$trained")
    assert(trained >= untrained,
      s"training must not hurt recall (untrained=$untrained, trained=$trained)")
    assert(trained >= 0.95, s"trained recall $trained below 0.95")
    assert(untrained <= 0.99, // fixture sanity: the draw leaves headroom
      s"fixture no longer exercises training (untrained=$untrained)")
  }

  test("SubmissionStore: in-batch duplicates and null duplicate-fields rejected") {
    val s = spark; import s.implicits._
    val inner = new MemoryStore(spark, "subs2", key = "submission_id")
    val st = new SubmissionStore(inner, duplicateFields = Seq("formula", "author"))
    // same (formula, author) twice in ONE batch -> one accepted
    val (a1, r1) = st.submit(Seq(("Fe2O3", "ada"), ("Fe2O3", "ada")).toDF("formula", "author"))
    assert(a1 === 1 && r1 === 1)
    // null field values are duplicate-significant (null-safe matching)
    val (a2, r2) = st.submit(Seq(("X", null), ("X", null)).toDF("formula", "author"))
    assert(a2 === 1 && r2 === 1)
    val (a3, r3) = st.submit(Seq(("X", null)).toDF("formula", "author"))
    assert(a3 === 0 && r3 === 1)
  }

  test("empty $or matches nothing; empty $and matches all; $nor [] matches all") {
    val s = spark; import s.implicits._
    val df = Seq(1, 2, 3).toDF("a")
    assert(graft.query.MongoFilter(df, """{"$or": []}""").count() === 0)
    assert(graft.query.MongoFilter(df, """{"$and": []}""").count() === 3)
    assert(graft.query.MongoFilter(df, """{"$nor": []}""").count() === 3)
  }
}