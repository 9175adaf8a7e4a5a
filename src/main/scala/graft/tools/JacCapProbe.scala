package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe for the jacPairs08 25× knee (r11 build octave): the exact
  * inverted-index Jaccard pair build is candidate-volume-bound —
  * Σ_h df(h)² — and at the 25× replica corpus the shared (unsalted)
  * shingle tails push it super-linear (α 2.06 over the 5×→25×
  * octave). [[graft.dedup.Dedup.jaccardPairsFrom]] ships the standard
  * mitigation (`dfCap`: drop shingles with document frequency above
  * the cap from CANDIDATE GENERATION only; verification still scores
  * full sets). This probe measures the build at a directory with the
  * cap off and at several cap values, plus the emitted-pair recall at
  * each cap — the numbers behind SCALE.md's knee paragraph.
  *
  * Run: `GRAFT_SWEEP_DIRS=<dir>[,dir...] runMain graft.tools.JacCapProbe
  * [caps...]` (default caps: 64, 256). */
object JacCapProbe {

  def main(args: Array[String]): Unit = {
    val dirs = sys.env.get("GRAFT_SWEEP_DIRS")
      .map(_.split(',').toSeq.filter(_.nonEmpty))
      .getOrElse(sys.error("set GRAFT_SWEEP_DIRS"))
    val caps = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(64L, 256L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- dirs) {
      val sh = graft.functions.TextHash.addShingleHashes(
        graft.io.Tables.load(spark, d, "documents"), col("text"))
        .select("doc_id", "hs").localCheckpoint(true)
      def run(cap: Option[Long]): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = graft.dedup.Dedup.jaccardPairsFrom(sh, 0.8, cap).count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      run(None) // warmup (codegen; adjacent to timed)
      val (n0, t0) = run(None)
      println(f"""{"jac_cap":{"dir":"$d","cap":null,"pairs":$n0,"secs":$t0%.2f}}""")
      caps.foreach { c =>
        val (n, t) = run(Some(c))
        println(f"""{"jac_cap":{"dir":"$d","cap":$c,"pairs":$n,"secs":$t%.2f}}""")
      }
      sh.unpersist(blocking = true)
    }
  }
}
