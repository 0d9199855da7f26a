package graft

import org.apache.spark.sql.functions._
import graft.operators.Pack

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("packGreedy's two-phase cumsum equals a driver-side global prefix " +
      "sum, across bucket sizes and id gaps") {
    // sparse, gappy ids (bucket boundaries land mid-gap) + zero weights
    val rows = Seq(
      (3L, 10L), (7L, 0L), (99L, 25L), (100L, 5L), (101L, 5L),
      (250L, 40L), (251L, 1L), (999L, 7L), (1000L, 3L), (5000L, 12L))
    val df = rows.toDF("id", "w")
    val expectCum = rows.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (id, w)) => (id, acc + w) }
      .tail.toMap
    for (bucketSize <- Seq(1L, 4L, 100L, 1000L, 100000L)) {
      val got = Pack.packGreedy(df, "id", "w", shardWeight = 30L, bucketSize)
        .select("id", "cum").as[(Long, Long)].collect().toMap
      assert(got == expectCum, s"bucketSize=$bucketSize")
    }
  }

  test("greedy shards: exclusive prefix weight dictates the shard, and " +
      "every shard except possibly the last reaches its weight") {
    val df = (0L until 100L).map(i => (i, 7L)).toDF("id", "w")
    val out = Pack.packGreedy(df, "id", "w", shardWeight = 20L, bucketSize = 9L)
      .select("id", "cum", "shard").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    out.foreach { case (id, cum, shard) =>
      assert(shard == (cum - 7L) / 20L, s"id=$id")
    }
    // shards are contiguous in id order and weights accumulate correctly
    val byShard = out.groupBy(_._3).toSeq.sortBy(_._1)
    byShard.sliding(2).foreach {
      case Seq((s1, rows1), (s2, rows2)) =>
        assert(s2 == s1 + 1)
        assert(rows1.map(_._1).max < rows2.map(_._1).min)
      case _ => ()
    }
    // greedy fill: every non-final shard's cumulative weight crosses its
    // weight boundary (an exclusive-vs-inclusive prefix regression would
    // shift every boundary and under-fill shards while keeping the
    // shard formula self-consistent)
    val lastShard = byShard.last._1
    byShard.filter(_._1 != lastShard).foreach { case (s, rows) =>
      val endCum = rows.map(_._2).max // inclusive cum of the shard's last doc
      assert(endCum >= (s + 1) * 20L,
        s"shard $s under-filled: reaches only $endCum of ${(s + 1) * 20L}")
    }
  }
}
