package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement main for star-CC round batching: how many star
  * rounds do the real near-dup graph and a 200-chain take, and what does
  * checking convergence every round vs every second round cost? */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"=== $tag: median ${ts(1)}%.3f min ${ts.head}%.3f")
    }
    val chain = spark.range(0, 200)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    for (rpc <- Seq(1, 2, 3)) {
      val n = graft.dedup.Dedup.starComponents(chain, maxRounds = 30,
        roundsPerCheck = rpc).count()
      println(s"=== chain rpc=$rpc rows=$n rounds=" +
        graft.dedup.Dedup.lastStarRounds)
    }
    // DEEP case (VERDICT r5 #7): near-dup graphs are shallow, but the
    // 100 TB risk is a deep component. 2000 parallel chains of 500 nodes
    // (1M nodes / ~1M edges, diameter 499) give depth AND real per-round
    // shuffle volume, so the per-check fixed costs (checkpoint + count +
    // except) compete against genuine star-round work.
    val deep = spark.range(0, 2000L * 500)
      .filter(col("id") % 500 =!= 499)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      .localCheckpoint(true)
    for (rpc <- Seq(1, 2, 3)) {
      time(s"deep 2000x500 starCC rpc=$rpc") {
        graft.dedup.Dedup.starComponents(deep, maxRounds = 40,
          roundsPerCheck = rpc).count()
      }
      println(s"    rounds=" + graft.dedup.Dedup.lastStarRounds)
    }
    val pairs = graft.dedup.Dedup.jaccardPairsFrom(
      graft.functions.TextHash.addShingleHashes(
        graft.io.Tables.load(spark, d, "documents"), col("text"))
        .select("doc_id", "hs"), 0.8, None)
      .select("doc_a", "doc_b").localCheckpoint(true)
    for (rpc <- Seq(1, 2, 3)) {
      time(s"sf0.1 starCC rpc=$rpc") {
        graft.dedup.Dedup.starComponents(pairs,
          roundsPerCheck = rpc).count()
      }
      println(s"    rounds=" + graft.dedup.Dedup.lastStarRounds)
    }
    spark.stop()
  }
}
