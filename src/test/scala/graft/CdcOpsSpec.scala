package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.graph.GraphOps
import graft.queries.CdcOps

/** Semantics the DuckDB oracle cannot cover for the CDC/sampling/skyline
  * family: the distributed skyline core against the quadratic dominance
  * definition on adversarial synthetic frames, the butterfly hot-vertex
  * guard, and the heap-top-k plan shape of the weighted sample. */
class CdcOpsSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  test("skyline core matches quadratic dominance on a random frame") {
    import spark.implicits._
    // deterministic pseudo-random points, duplicates included: id mod
    // arithmetic gives repeated (price, size) pairs, which must ALL
    // survive together or fall together (dominance is strict)
    val pts = (0 until 400).map { i =>
      (i.toLong, ((i * 7919) % 83).toDouble, ((i * 104729) % 59).toLong)
    }
    val df = pts.toDF("p_partkey", "price", "psize")
    val naive = pts.filter { case (_, p, s) =>
      !pts.exists { case (_, qp, qs) =>
        (qp < p && qs <= s) || (qp <= p && qs < s)
      }
    }.map(t => (t._1, t._2, t._3)).toSet
    val got = CdcOps.skylineOf(df, slices = Some(4)).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == naive)
  }

  test("skyline core: single-partition slice count still correct") {
    import spark.implicits._
    val df = Seq((1L, 1.0, 5L), (2L, 1.0, 5L), (3L, 2.0, 4L), (4L, 2.0, 9L),
      (5L, 3.0, 4L)).toDF("p_partkey", "price", "psize")
    // (1,2) duplicate frontier points both survive; (4) dominated within
    // its price group; (5) dominated by (3) across groups (equal size,
    // strictly cheaper)
    val got = CdcOps.skylineOf(df, slices = Some(1)).select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("butterfly wedge join excludes parts above the degree cap") {
    import spark.implicits._
    // part 99 is a hot star (degree 5 > cap 4): its wedges must not count
    val hot = (0 until 5).map(s => (99L, s.toLong))
    val quiet = Seq((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L), (2L, 2L))
    val e = (hot ++ quiet).toDF("p", "sup")
    val got = GraphOps.butterflyPairs(e, degCap = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // quiet parts only: suppliers 0,1 share parts {1,2}; 0,2 and 1,2 share {2}
    assert(got == Map((0L, 1L) -> 2L, (0L, 2L) -> 1L, (1L, 2L) -> 1L))
    // and with the cap lifted the star contributes its C(2,5)=10 wedges
    val uncapped = GraphOps.butterflyPairs(e, degCap = 100)
      .agg(sum("shared_parts")).collect()(0).getLong(0)
    assert(uncapped == 4L + 10L)
  }

  test("weighted sample plan is a heap top-k, not a global sort") {
    val plan = executed(CdcOps.qWeightedSample.fn(spark, sf001)).toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortExec"), plan)
  }

  test("merge actions partition the key space") {
    val rows = CdcOps.qMergeUpsert.fn(spark, sf001).collect()
    val keys = rows.map(_.getLong(0))
    assert(keys.distinct.length == keys.length)
    // every action value is one of the three, and updates dominate on
    // this data (customers active both before and after the cutoff)
    val acts = rows.map(_.getString(1)).toSet
    assert(acts.subsetOf(Set("insert", "update", "keep")))
  }
}
