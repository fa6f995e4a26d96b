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
}
