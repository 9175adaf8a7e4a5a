package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Large-star/small-star connected components: agreement with the
  * label-propagation spelling on real data, and the property it exists
  * for — logarithmic rounds on a DEEP component, where one-hop label
  * propagation would need one shuffle round per hop. */
class StarComponentsSpec extends SparkSpec {

  test("star CC equals label-propagation CC on the near-dup graph") {
    val star = Dedup.qDedupComponentsStar.fn(spark, sf001)
    val prop = Dedup.qDedupComponents.fn(spark, sf001)
    assert(star.count() == prop.count())
    assert(star.except(prop).count() == 0)
    assert(prop.except(star).count() == 0)
  }

  test("a 200-node chain converges within 10 star rounds (log, not hop)") {
    // path graph 0-1-2-...-200: diameter 200. Label propagation moves the
    // min one hop per round; star rounds square path lengths away.
    val chain = spark.range(0, 200)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val labels = Dedup.starComponents(chain, maxRounds = 10)
    assert(labels.count() == 201)
    assert(labels.filter(col("component") =!= 0L).count() == 0)
    assert(labels.filter(col("is_kept")).count() == 1)
  }

  test("star CC handles cycles, multi-components and isolated pairs") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), // cycle
      (10L, 11L), (11L, 12L), (12L, 10L), (10L, 12L), // cycle + chord
      (20L, 21L), // isolated pair
      (30L, 30L)) // self-loop only: single node, dropped edge
    import spark.implicits._
    val labels = Dedup.starComponents(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.view.filterKeys(Set(1L, 2L, 3L)).values.toSet == Set(1L))
    assert(labels.view.filterKeys(Set(10L, 11L, 12L)).values.toSet
      == Set(10L))
    assert(labels(20L) == 20L && labels(21L) == 20L)
    // the self-loop node never appears: no real edge touches it
    assert(!labels.contains(30L))
  }
}
