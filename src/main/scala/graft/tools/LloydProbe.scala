package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** r14 optimization probe: where does a kmeansConverged ROUND go?
  *
  * q_kmeans_converged measured 3.9 s at sf0.1 over ~500 rows of data —
  * per-round cost must be engine overhead (planning, codegen, job
  * latency), not arithmetic. This probe times each assign+update round
  * for three value-identical assignment spellings:
  *   - `hof`: the shipped literal-centroid zip_with/aggregate fold
  *     (HigherOrderFunction — CodegenFallback, interpreted per row);
  *   - `dot`: literal-centroid integer dot identity Σc²+Σm²−2⟨c,m⟩
  *     through the codegen'd GraftDotLong kernel (array literals land in
  *     the codegen reference pool, so the generated source is identical
  *     across rounds — Janino cache hit);
  *   - `join`: the broadcast-join form (lloydAssignJoin).
  * Prints per-round wall ms and asserts all three converge to the same
  * centroid matrix in the same round count.
  */
object LloydProbe {

  private def idot(a: Column, b: Column): Column =
    call_function(graft.functions.GraftDotLong.FunctionName, a, b)

  /** Dot-identity literal assignment — value-identical to
    * Similarity.lloydAssign (same integer d2, same (d2, cl) argmin). */
  private def assignDot(
      codes: DataFrame, cents: Seq[(Long, Seq[Long])]): DataFrame = {
    val scored = array(cents.map { case (cl, m) =>
      val m2 = m.map(x => x * x).sum
      struct(
        (idot(col("c"), col("c")) + lit(m2)
          - lit(2L) * idot(col("c"), typedlit(m))).as("d2"),
        lit(cl).as("cl"))
    }: _*)
    codes.withColumn("best", array_min(scored))
      .withColumn("cl", col("best.cl"))
      .withColumn("d2", col("best.d2"))
      .drop("best")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftDotLong.ensureRegistered(spark)

    val codes = Similarity.int8Codes(spark, sfDir).select("vec_id", "c")
    println(s"[probe] codes rows = ${codes.count()}")

    def runLoop(tag: String,
        assign: (DataFrame, Seq[(Long, Seq[Long])]) => DataFrame)
        : Seq[(Long, Seq[Long])] = {
      var cents = Similarity.lloydSeed(codes, 8)
      var rounds = 0
      var stable = false
      val t0 = System.nanoTime()
      while (!stable && rounds < 100) {
        val r0 = System.nanoTime()
        val next = Similarity.lloydUpdate(assign(codes, cents))
        val ms = (System.nanoTime() - r0) / 1e6
        val prev = cents.toMap
        stable = next.size == cents.size && next.forall { case (cl, m) =>
          prev.get(cl).exists(pm =>
            m.zip(pm).forall { case (a, b) => math.abs(a - b) <= 1 })
        }
        println(f"[probe] $tag round=$rounds ms=$ms%.1f stable=$stable")
        if (!stable) { cents = next; rounds += 1 }
      }
      println(f"[probe] $tag TOTAL ms=${(System.nanoTime() - t0) / 1e6}%.1f rounds=$rounds")
      cents
    }

    // 2 passes each: pass 2 shows what survives warm codegen caches
    val a1 = runLoop("hof-1", Similarity.lloydAssign)
    val a2 = runLoop("hof-2", Similarity.lloydAssign)
    val b1 = runLoop("dot-1", assignDot)
    val b2 = runLoop("dot-2", assignDot)
    val c1 = runLoop("join-1", Similarity.lloydAssignJoin)
    val c2 = runLoop("join-2", Similarity.lloydAssignJoin)
    require(a1 == b1 && b1 == c1 && a1 == a2 && b1 == b2 && c1 == c2,
      "assignment variants diverged")
    println("[probe] all variants value-identical")
    spark.stop()
  }
}
