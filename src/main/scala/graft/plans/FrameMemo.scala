package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialized-frame memo: first call per (session, tag,
  * sfDir) eagerly localCheckpoints the built frame; later calls reuse
  * the blocks. The pattern behind every derived "index" the engine
  * serves repeatedly — int8 codes, IVF assignments, LSH banding,
  * shingle sets — production systems PERSIST these artifacts rather
  * than re-derive them per query, and the memo is that materialization.
  * Weak session key keeps a stopped session's blocks collectable;
  * entries are bounded by (#indexes × #scale dirs) per session. At
  * cluster scale localCheckpoint stores to executor block storage,
  * which spills like MEMORY_AND_DISK. */
object FrameMemo {

  private val cache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, DataFrame]]()

  def memo(s: SparkSession, tag: String, d: String)(
      build: => DataFrame): DataFrame = cache.synchronized {
    var perSession = cache.get(s)
    if (perSession == null) {
      perSession = scala.collection.mutable.Map.empty[String, DataFrame]
      cache.put(s, perSession)
    }
    perSession.getOrElseUpdate(s"$tag@$d", build.localCheckpoint(true))
  }
}
