package graft

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.queries.PartitionOps

/** The partitioned-layout cache contract (ADVICE r7 #3): keyed by a
  * source fingerprint (length+mtime) so a CHANGED source never reuses a
  * stale layout, built via staging-dir + atomic rename so a concurrent
  * builder can never observe a half-written layout, and reused across
  * "JVMs" (simulated by clearing the per-JVM memo) purely off the
  * on-disk `_SUCCESS` marker without rebuilding. */
class PartitionLayoutCacheSpec extends SparkSpec {

  test("fingerprint keying: same source reuses, changed source rebuilds") {
    val dir = Files.createTempDirectory("graft_layout_spec")
    Files.copy(Paths.get(s"$sf001/orders.parquet"),
      dir.resolve("orders.parquet"))
    val d = dir.toString

    val p1 = PartitionOps.partitionedOrdersDir(spark, d)
    assert(new File(s"$p1/_SUCCESS").exists, p1)
    // no stray staging dirs left behind
    val parent = new File(p1).getParentFile
    assert(!parent.listFiles.exists(_.getName.contains(".build-")),
      parent.listFiles.map(_.getName).mkString(","))

    // same source: same dir, and (memo cleared = fresh JVM) no rebuild —
    // the partition files' mtimes are untouched
    val someFile = new File(p1).listFiles
      .filter(_.getName.startsWith("o_month=")).head
      .listFiles.head
    val mtime = someFile.lastModified
    PartitionOps.built.synchronized(PartitionOps.built.clear())
    assert(PartitionOps.partitionedOrdersDir(spark, d) == p1)
    assert(someFile.lastModified == mtime, "layout was rebuilt needlessly")

    // changed source (different content => different len/mtime): a NEW
    // layout dir is built; the stale one is never served
    Files.copy(Paths.get("/root/testdata/sf0.01/orders.parquet"),
      dir.resolve("orders.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val p2 = PartitionOps.partitionedOrdersDir(spark, d)
    assert(p2 != p1, "stale layout reused after source change")
    assert(new File(s"$p2/_SUCCESS").exists, p2)
    // the new layout reflects the new source's row count
    val n = spark.read.parquet(p2).count()
    val expect = spark.read
      .parquet("/root/testdata/sf0.01/orders.parquet").count()
    assert(n == expect)
  }
}
