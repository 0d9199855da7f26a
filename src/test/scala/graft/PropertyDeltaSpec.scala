package graft

import java.nio.file.Files
import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.CowTable

/** RANDOMIZED delta-vs-full manifest equivalence (round 15): the same
  * seeded operation sequence runs against a DELTA-enabled table and a
  * twin forced to write FULL manifests (checkpoint interval 0 makes
  * every commit ineligible for the delta form), and the two must be
  * indistinguishable through every read surface after every step —
  * the manifest representation is an encoding, never semantics.
  *
  * Flipping the JVM-global interval property around the twin's ops is
  * safe for concurrently-running suites: it only changes which FORM
  * their commits write, and a full manifest is always correct.
  */
class PropertyDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("propdelta").toString

  private val Prop = "graft.cow.manifest.checkpoint"

  private def fullManifests[A](body: => A): A = {
    val old = sys.props.get(Prop)
    sys.props(Prop) = "0"
    try body
    finally old match {
      case Some(v) => sys.props(Prop) = v
      case None => sys.props.remove(Prop)
    }
  }

  private def contents(root: String): Seq[String] =
    CowTable.read(spark, root).get
      .orderBy("id").collect().toSeq.map(_.toString)

  test("a random op sequence on a delta-manifest table equals its " +
      "forced-full twin through reads, time travel, skipping and " +
      "metadata — at every step, warm and cold") {
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      val a = s"${tmp()}/t" // deltas on (default interval)
      val b = s"${tmp()}/t" // forced full manifests
      def batch(n: Int, tag: Long) = spark.range(n)
        .select(($"id" + tag * 1000).as("id"),
          (($"id" + tag) % 4).as("p"), ($"id" * 3 + tag).as("v"))
      def onBoth(f: (String, Long) => Unit, id: Long): Unit = {
        f(a, id); fullManifests(f(b, id))
      }
      CowTable.commitFull(batch(40, 0), a, 1L, Seq("p"), keep = 3)
      fullManifests(
        CowTable.commitFull(batch(40, 0), b, 1L, Seq("p"), keep = 3))
      var id = 1L
      (1 to 12).foreach { step =>
        id += 1
        val tag = rnd.nextInt(5).toLong
        // every random draw happens ONCE per step, outside the lambda
        // (it runs twice — once per table)
        rnd.nextInt(6) match {
          case 0 =>
            val n = 5 + rnd.nextInt(10)
            onBoth((r, i) => CowTable.commitAppend(
              batch(n, tag), r, i, Seq("p"), keep = 3), id)
          case 1 => onBoth((r, i) => CowTable.upsert(spark, r, i,
            batch(5, tag), Seq("id"), Seq("p"), keep = 3), id)
          case 2 =>
            val cut = rnd.nextInt(40).toLong
            onBoth((r, i) => CowTable.deleteWhereDv(spark, r, i,
              col("id") === cut, keep = 3), id)
          case 3 =>
            val cut = rnd.nextInt(3000).toLong
            onBoth((r, i) => CowTable.updateWhere(spark, r, i,
              col("id") > cut, Map("v" -> (col("v") + 1)), keep = 3), id)
          case 4 => onBoth((r, i) => {
            CowTable.vacuum(spark, r, keep = 3)
            CowTable.compactPartitions(spark, r, i, keep = 3); () }, id)
          case 5 =>
            if (rnd.nextBoolean()) CowTable.clearManifestMemoForTest()
            onBoth((r, i) => CowTable.commitAppend(
              batch(3, tag + 7), r, i, Seq("p"), keep = 3), id)
        }
        assert(contents(a) == contents(b),
          s"seed $seed step $step: delta table diverged from full twin")
      }
      // cold resolution (chains re-walked from disk) still agrees
      CowTable.clearManifestMemoForTest()
      assert(contents(a) == contents(b), s"seed $seed: cold divergence")
      // metadata surfaces agree where layout-independent
      val (ma, mb) = (CowTable.currentManifest(spark, a).get,
        CowTable.currentManifest(spark, b).get)
      assert(ma.schema == mb.schema && ma.partCols == mb.partCols)
      assert(ma.files.map(_.rows).sum == mb.files.map(_.rows).sum,
        s"seed $seed: manifest row totals diverged")
      // shared retained snapshots time-travel identically (the delta
      // table may retain MORE history via chains — compare the ids
      // both kept)
      val shared = CowTable.committedIds(spark, a)
        .intersect(CowTable.committedIds(spark, b))
      shared.takeRight(3).foreach { i =>
        val ta = CowTable.readAt(spark, a, i).get.orderBy("id")
          .collect().toSeq.map(_.toString)
        val tb = CowTable.readAt(spark, b, i).get.orderBy("id")
          .collect().toSeq.map(_.toString)
        assert(ta == tb, s"seed $seed: time travel to $i diverged")
      }
      // and an explicit collapse + aggressive vacuum converges the two
      CowTable.checkpoint(spark, a, CowTable.committedIds(spark, a).last)
      CowTable.vacuum(spark, a, keep = 1, collapse = true)
      fullManifests(CowTable.vacuum(spark, b, keep = 1))
      assert(contents(a) == contents(b), s"seed $seed: post-collapse")
      assert(CowTable.committedIds(spark, a).size == 1)
    }
  }
}
