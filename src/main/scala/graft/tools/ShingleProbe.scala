package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement main: how much of the jaccard-pair family's cost
  * is the shingle pipeline itself vs the candidate join? */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      f; f // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"=== $tag: median ${ts(2)}%.3f min ${ts.head}%.3f")
    }
    val docs = graft.io.Tables.load(spark, d, "documents")
    time("shingle pipeline only") {
      graft.functions.TextHash.addShingleHashes(docs, col("text"))
        .select(sum(size(col("hs")))).count()
    }
    time("shingle + explode") {
      graft.functions.TextHash.addShingleHashes(docs, col("text"))
        .select(col("doc_id"), explode_outer(col("hs")).as("h"))
        .filter(col("h").isNotNull).count()
    }
    time("full q_ngram_jaccard_pairs") {
      graft.dedup.Dedup.qNgramJaccardPairs.fn(spark, d).count()
    }
    spark.stop()
  }
}
