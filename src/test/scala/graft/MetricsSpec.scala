package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Metrics

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("listener records scan bytes/files, shuffle write and output " +
      "rows for a grouped parquet query") {
    val l = Metrics.register(spark)
    try {
      val n = Tables.load(spark, sfDir, "orders")
        .groupBy("o_orderstatus").count().collect().length
      val ms = l.drainWhen(_.nonEmpty)
      assert(ms.nonEmpty, "listener saw no completed action")
      val m = ms.last
      assert(m.error.isEmpty)
      assert(m.outputRows == n, s"outputRows ${m.outputRows} != $n")
      assert(m.filesRead > 0, s"no files counted: $m")
      assert(m.bytesRead > 0, s"no bytes counted: $m")
      assert(m.shuffleBytesWritten > 0, s"groupBy must shuffle: $m")
      assert(m.durationMs >= 0)
    } finally spark.listenerManager.unregister(l)
  }

  test("pruned scans read fewer bytes than full scans — the regression " +
      "signal the metrics exist for") {
    val l = Metrics.register(spark)
    try {
      val li = Tables.load(spark, sfDir, "lineitem")
      li.select("l_orderkey").where(col("l_orderkey") === 1L).count()
      val pruned = l.drainWhen(_.nonEmpty).last
      li.count()
      val full = l.drainWhen(_.nonEmpty).last
      assert(pruned.bytesRead > 0 && full.bytesRead > 0)
      assert(pruned.bytesRead <= full.bytesRead,
        s"pruned ${pruned.bytesRead} > full ${full.bytesRead}")
    } finally spark.listenerManager.unregister(l)
  }

  test("failures are recorded sanitized; metrics frame lands in an " +
      "audit sink") {
    val l = Metrics.register(spark)
    try {
      intercept[Exception] {
        spark.read.parquet("/does/not/exist-graft").count()
      }
      // a failed ANALYSIS never reaches the listener in all versions —
      // only assert the drain path and the sink round-trip
      val dir = java.nio.file.Files.createTempDirectory("graft-mx").toString
      Tables.load(spark, sfDir, "region").count()
      val ms = l.drainWhen(_.nonEmpty)
      Metrics.toDf(spark, ms).write.parquet(s"$dir/audit")
      assert(spark.read.parquet(s"$dir/audit").count() == ms.size)
    } finally spark.listenerManager.unregister(l)
  }
}
