package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`Array[Float]`). North-star extension (SURVEY §0).
  *
  * Two tiers:
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the query set,
  *    one scan of the corpus, per-query `row_number` top-k. The baseline
  *    and the verifier. All math is `zip_with`/`aggregate` expressions in
  *    double precision — codegen'd, no UDFs.
  *  - [[lshTopK]] — random-hyperplane LSH: h sign-bits → bucket, probe
  *    same-bucket candidates only, exact rerank inside the bucket. The
  *    100 TB path: corpus is bucketed once (write-time layout at scale),
  *    each query touches ~1/2^h of the data.
  *
  * Embedding-cosine near-duplicate detection ([[cosineDupPairs]]) rides
  * the same LSH machinery.
  */
object Similarity {

  /** Sequential-fold dot product in double precision (deterministic:
    * fixed evaluation order → reproducible across runs and engines).
    * HOF form — the portable fallback; the hot paths below use the
    * codegen'd [[graft.functions.DotProduct]] kernel instead. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Fused single-pass native cosine (same fold order → same doubles). */
  private def nativeCosine(df: DataFrame, a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine(df.sparkSession, a, b)

  /** Exact cosine top-k: for each row of `queries`, the `k` nearest
    * corpus rows. `queries` is broadcast (it is the small side by
    * construction). Ties broken by corpus id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val q = broadcast(queries.select(col(idCol).alias("q_id"),
      col(vecCol).alias("q_vec")))
    val c = corpus.select(col(idCol).alias("n_id"), col(vecCol).alias("n_vec"))
    val scored = c.crossJoin(q)
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("sim", nativeCosine(corpus, col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("sim"), 4).alias("sim"))
  }

  /** Random-hyperplane signature: `h` sign bits packed into a long.
    * Hyperplanes are generated from a fixed seed — data-independent,
    * identical on every executor, never shipped as data. */
  def hyperplanes(dim: Int, h: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(h, dim)(rnd.nextGaussian())
  }

  private def signature(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val proj = aggregate(
        zip_with(vec, lit(p), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed approximate top-k: candidates = corpus rows whose
    * signature differs from the query signature in ≤ `probeHamming` bits
    * (0 = same bucket only), exact cosine rerank within candidates.
    * Recall < 1 by design; raise `probeHamming` or lower `h` to trade
    * speed for recall. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              h: Int = 12, probeHamming: Int = 1,
              idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val planes = hyperplanes(dim, h)
    val c = corpus.select(col(idCol).alias("n_id"), col(vecCol).alias("n_vec"),
      signature(col(vecCol), planes).alias("n_sig"))
    val q = broadcast(queries.select(col(idCol).alias("q_id"),
      col(vecCol).alias("q_vec"), signature(col(vecCol), planes).alias("q_sig")))
    val cand = c.join(q,
      bit_count(col("n_sig").bitwiseXOR(col("q_sig"))) <= probeHamming &&
      col("n_id") =!= col("q_id"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    cand.withColumn("sim", nativeCosine(corpus, col("q_vec"), col("n_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("sim"), 4).alias("sim"))
  }

  /** IVF (inverted-file) approximate top-k — the second scale path the
    * spec names alongside LSH. Coarse quantizer = `nCentroids` corpus
    * vectors picked by deterministic stride (no k-means dependency; at
    * cluster scale swap in trained centroids without changing the plan
    * shape). Every corpus vector is assigned to its nearest centroid
    * (broadcast centroid table, one scan); a query probes the `nprobe`
    * nearest centroid cells and reranks exactly inside them — touching
    * ~nprobe/nCentroids of the corpus instead of all of it. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              family: String = "xxh64")
      : DataFrame = {
    val w = Window.partitionBy(col("__rid")).orderBy(col("__csim").desc, col("c_id").asc)
    // deterministic pseudo-random centroid pick: one TakeOrdered pass by
    // id-hash — no global sort, no driver materialization
    val centOrder = graft.ext.Dedup.seededHash(family, 0, col(idCol).cast("string"))
    val cents = broadcast(
      corpus.orderBy(centOrder.asc, col(idCol).asc).limit(nCentroids)
        .select(col(idCol).alias("c_id"), col(vecCol).alias("c_vec")))
    def assign(df: DataFrame, id: String, vec: String, keep: Int): DataFrame =
      df.select(col(id).alias("__rid"), col(vec).alias("__rvec"))
        .crossJoin(cents)
        .withColumn("__csim", nativeCosine(df, col("__rvec"), col("c_vec")))
        .withColumn("__crank", row_number().over(w))
        .filter(col("__crank") <= keep)
        .select(col("__rid"), col("__rvec"), col("c_id").alias("cell"))
    val cells = assign(corpus, idCol, vecCol, 1)
      .select(col("__rid").alias("n_id"), col("__rvec").alias("n_vec"), col("cell"))
    val probes = assign(queries, idCol, vecCol, nprobe)
      .select(col("__rid").alias("q_id"), col("__rvec").alias("q_vec"), col("cell"))
    val wq = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    cells.join(broadcast(probes), Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("sim", nativeCosine(corpus, col("q_vec"), col("n_vec")))
      .withColumn("rank", row_number().over(wq))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("sim"), 4).alias("sim"))
  }

  /** Embedding-cosine near-duplicate pairs: LSH same-bucket candidates,
    * verified `cosine >= threshold`. Returns `(a, b, sim)`, a < b. */
  def cosineDupPairs(corpus: DataFrame, dim: Int, threshold: Double = 0.95,
                     h: Int = 12, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(dim, h)
    val sigs = corpus.select(col(idCol).alias("id"), col(vecCol).alias("vec"),
      signature(col(vecCol), planes).alias("sig"))
    val a = sigs.select(col("sig"), col("id").alias("a"), col("vec").alias("va"))
    val b = sigs.select(col("sig"), col("id").alias("b"), col("vec").alias("vb"))
    a.join(b, Seq("sig")).filter(col("a") < col("b"))
      .withColumn("sim", nativeCosine(corpus, col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), round(col("sim"), 4).alias("sim"))
  }
}
