package graft

/** Physical-plan regression guards: the plans we verified by hand
  * (.explain iteration) must stay the plans we ship. */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("c13_joint_lookup broadcasts the dimension side") {
    val p = plan("c13_joint_lookup")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("s1_query_fold compiles to TakeOrderedAndProject with pushed filters (no global sort)") {
    val p = plan("s1_query_fold")
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$p")
    assert(!p.contains("rangepartitioning"), s"unexpected global sort:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull"), s"expected pushed filters:\n$p")
  }

  test("q1_agg does map-side partial aggregation and prunes the scan") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), s"expected partial aggregation:\n$p")
    // only the 5 referenced columns reach the scan
    val scanLine = p.split("\n").find(_.contains("FileScan parquet")).get
    assert(!scanLine.contains("l_orderkey"), s"scan not pruned:\n$scanLine")
  }

  test("topk is a single TakeOrdered (no shuffle-heavy sort)") {
    val p = plan("topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$p")
  }

  test("IVF corpus-side centroid assignment is a pure projection (no window/sort/shuffle)") {
    import org.apache.spark.sql.functions._
    val emb = sf("embeddings")
    val cents = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").alias("c_id"), col("embedding").alias("c_vec"))
    val p = graft.ext.Similarity.assignToCells(emb, cents, "vec_id", "embedding", keep = 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"unexpected window in assignment:\n$p")
    assert(!p.contains("Sort "), s"unexpected sort in assignment:\n$p")
    assert(!p.contains("Exchange"), s"unexpected shuffle in assignment:\n$p")
  }

  test("sim_cosine_topk reduces via bounded-heap aggregate, not a full-width window") {
    val p = plan("sim_cosine_topk")
    assert(!p.contains("Window"), s"unexpected window in brute-force top-k:\n$p")
    assert(p.contains("graft_topk"), s"expected graft_topk aggregate:\n$p")
  }
}
