package graft

import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Convergence-gated Lloyd ([[Similarity.kmeansConverged]]) — the
  * VERDICT-r4-#3 pattern applied to clustering: the fixed-round oracle
  * query ([[Similarity.qKmeans]]) stays, the convergent variant is
  * spec-gated. */
class KmeansSpec extends SparkSpec {

  private lazy val codes =
    Similarity.int8Codes(spark, sf001).select("vec_id", "c")
      .localCheckpoint(true)

  private def inertia(cents: Seq[(Long, Seq[Long])]): Long =
    Similarity.lloydAssign(codes, cents)
      .agg(sum("d2")).collect()(0).getLong(0)

  test("kmeansConverged reaches a true fixed point") {
    val (cents, rounds) = Similarity.kmeansConverged(spark, sf001,
      maxRounds = 60)
    assert(rounds < 60, "no convergence within 60 rounds")
    assert(cents.nonEmpty && cents.size <= 8)
    // fixed point: one more assign→update cycle reproduces the matrix
    // bit-for-bit (assignment is a deterministic function of centroids,
    // so stable centroids ⇒ stable assignments)
    val again = Similarity.lloydUpdate(Similarity.lloydAssign(codes, cents))
    assert(again == cents, "centroids are not a Lloyd fixed point")
  }

  test("converged objective is no worse than the fixed-round query's") {
    val (converged, _) = Similarity.kmeansConverged(spark, sf001,
      maxRounds = 60)
    val threeRound = Similarity.lloydCentroids(codes, 8, rounds = 3)
    assert(inertia(converged) <= inertia(threeRound),
      "Lloyd iteration increased the clustering objective")
  }
}
