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

  test("kmeansConverged at tol=0 reaches a true fixed point") {
    val (cents, rounds) = Similarity.kmeansConverged(spark, sf001,
      maxRounds = 100, tol = 0)
    assert(rounds < 100, "no convergence within 100 rounds")
    assert(cents.nonEmpty && cents.size <= 8)
    // fixed point: one more assign→update cycle reproduces the matrix
    // bit-for-bit (assignment is a deterministic function of centroids,
    // so stable centroids ⇒ stable assignments)
    val again = Similarity.lloydUpdate(Similarity.lloydAssign(codes, cents))
    assert(again == cents, "centroids are not a Lloyd fixed point")
  }

  test("default tol=1 stops in far fewer rounds, within 1 unit of motion") {
    // the floored integer update CREEPS by ±1 near the optimum (r6:
    // exact fixed point at round 61 at sf0.1); tol=1 cuts the tail
    val (cents, rounds) = Similarity.kmeansConverged(spark, sf001)
    val (_, exactRounds) = Similarity.kmeansConverged(spark, sf001,
      maxRounds = 100, tol = 0)
    assert(rounds <= exactRounds)
    // the returned (pre-update) matrix moves by at most 1 per coordinate
    // under one more cycle — the documented tolerance contract
    val again = Similarity.lloydUpdate(Similarity.lloydAssign(codes, cents))
      .toMap
    cents.foreach { case (cl, m) =>
      val n = again(cl)
      assert(m.zip(n).forall { case (a, b) => math.abs(a - b) <= 1 },
        s"cluster $cl moved by more than tol=1")
    }
  }

  test("non-convergence within maxRounds throws, never returns silently") {
    intercept[IllegalStateException] {
      Similarity.kmeansConverged(spark, sf001, maxRounds = 1, tol = 0)
    }
  }

  test("converged objective is no worse than the fixed-round query's") {
    val (converged, _) = Similarity.kmeansConverged(spark, sf001,
      maxRounds = 100, tol = 0)
    val threeRound = Similarity.lloydCentroids(codes, 8, rounds = 3)
    assert(inertia(converged) <= inertia(threeRound),
      "Lloyd iteration increased the clustering objective")
  }

  test("cell-balance report: retrain flag fires on a hot-cell index, " +
    "clears on a balanced one; both corpus quantizers report sanely") {
    import spark.implicits._
    // skewed fixture: 90 of 100 vectors in one cell → the hottest probe
    // costs 9× the balanced share, far past the 2.0 budget
    val hot = (1 to 100).map(i => if (i <= 90) 0L else (i % 10).toLong)
      .toDF("cell")
    val h = Similarity.cellStats(hot, "hot").head()
    assert(h.getBoolean(7), s"skewed index must flag retrain: $h")
    assert(h.getDouble(6) > Similarity.CellBalance)
    // balanced fixture: 10 cells × 10 vectors → imbalance exactly 1.0
    val bal = (0 until 100).map(i => (i % 10).toLong).toDF("cell")
    val b = Similarity.cellStats(bal, "bal").head()
    assert(!b.getBoolean(7), s"balanced index must not flag: $b")
    assert(b.getDouble(6) == 1.0)
    // the registered report: both quantizers, full corpus accounted,
    // max dominates mean dominates min
    val rows = Similarity.qAnnCellStats.fn(spark, sf001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("anchor16", "lloyd8"))
    val nVecs = graft.io.Tables.load(spark, sf001, "embeddings").count()
    rows.foreach { r =>
      assert(r.getLong(2) == nVecs, s"every vector must land in a cell: $r")
      assert(r.getLong(3) >= r.getDouble(5) && r.getDouble(5) >= r.getLong(4),
        s"max >= mean >= min violated: $r")
      assert(r.getDouble(6) >= 1.0)
    }
  }

  test("fused sqdist kernel (r15) is value-identical to the dot " +
    "identity on adversarial arrays") {
    import spark.implicits._
    graft.io.Tables.ensureSessionRegistered(spark)
    val m = Seq(-128L, 127L, 0L, -1L, 64L)
    val rows = Seq(
      Seq(127L, -128L, 0L, 1L, -64L), // max-spread diffs
      Seq(-128L, 127L, 0L, -1L, 64L), // exact match → 0
      Seq(0L, 0L, 0L, 0L, 0L)
    ).toDF("c")
    val m2 = m.map(x => x * x).sum
    val got = rows.select(
      expr(s"graft_sqdist_long(c, ${m.mkString("array(", ",", ")")})"),
      (expr("graft_dot_long(c, c)") + typedlit(m2)
        - typedlit(2L) * org.apache.spark.sql.functions.call_function(
          "graft_dot_long", col("c"), typedlit(m)))).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"fused sqdist diverged from the dot identity: $r"))
  }

  test("assignment kernel is value-identical to the HOF " +
    "reference (r14/r15 optimization: fused Σ(c−m)² via GraftSqDistLong)") {
    // corpus centroids after one update — ties and negative coords
    // included via the raw codes
    val cents = Similarity.lloydCentroids(codes, 8, rounds = 2)
    val fast = Similarity.lloydAssign(codes, cents)
      .select("vec_id", "cl", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val ref = Similarity.lloydAssignHof(codes, cents)
      .select("vec_id", "cl", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(fast.sameElements(ref),
      "kernel assignment diverged from the HOF reference")
  }
}
