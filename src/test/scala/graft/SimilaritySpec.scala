package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sfDir, "embeddings").cache()
  private lazy val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
  private lazy val queries = emb.where(col("vec_id") < 8)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("brute-force top-1 matches a driver-side exact computation") {
    val rows = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val q = rows.find(_._1 == 0L).get._2.map(_.toDouble)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expectTop = rows.filter(_._1 != 0L)
      .map { case (id, v) => id -> cos(q, v.map(_.toDouble)) }
      .maxBy(_._2)._1
    val got = Similarity.bruteForceTopK(corpus, queries, 5)
      .where(col("qid") === 0 && col("rank") === 1)
      .select("id").as[Long].head()
    assert(got == expectTop)
  }

  test("IVF recall beats the probed-fraction baseline and grows with nProbe") {
    // the test embeddings are near-uniform random (max pairwise cosine
    // ≈ 0.51), the worst case for IVF — so the contract asserted here is
    // relative: recall > probed fraction, and monotone in nProbe.
    val bf = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val (cells, centroids) = Similarity.ivfAssign(corpus, nCells = 16)
    def recallAt(nProbe: Int): Double = {
      val ivf = Similarity.ivfTopK(cells, centroids, queries, k = 5, nProbe = nProbe)
        .select("qid", "id").as[(Long, Long)].collect().toSet
      (ivf intersect bf).size.toDouble / bf.size
    }
    val r4 = recallAt(4)
    val r12 = recallAt(12)
    assert(r4 > 4.0 / 16, s"recall@nProbe=4 ($r4) below probed fraction")
    assert(r12 >= r4, s"recall not monotone: $r4 -> $r12")
    assert(r12 >= 0.6, s"recall@nProbe=12 = $r12")
  }

  test("IVF assigns every corpus vector to exactly one cell") {
    val (cells, _) = Similarity.ivfAssign(corpus, nCells = 8)
    assert(cells.count() == corpus.count())
    assert(cells.groupBy("id").count().where(col("count") > 1).count() == 0)
  }

  test("cosinePairsExact matches a driver-side exact computation and " +
      "bounds the LSH variant") {
    val slice = corpus.where(col("id") < 100)
    val got = Similarity.cosinePairsExact(slice, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // driver-side oracle over the same 100-vector slice
    val rows = slice.as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = (for {
      (ia, va) <- rows; (ib, vb) <- rows if ia < ib
      // mirror the query contract: threshold applies to the ROUNDED value
      if BigDecimal(cos(va, vb)).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= 0.3
    } yield (ia, ib)).toSet
    assert(got == expect)
    // LSH-bucketed variant emits only true pairs (precision 1.0): its
    // output over the slice must be a subset of the exact answer
    val lsh = Similarity.cosineNearDupPairs(slice, dim = 64, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(got))
  }

  test("ivfAssign plan: argmin is a scan-stage expression, no window shuffle") {
    // regression pin for the round-2 scale wart: the assign stage used
    // to crossJoin corpus×nCells then window row_number — a full
    // shuffle of the EXPLODED frame (nCells× amplification at the one
    // stage that touches every corpus vector). The rewrite computes the
    // argmax against the broadcast centroid array in the scan stage.
    val (cells, _) = Similarity.ivfAssign(corpus, nCells = 16)
    val plan = cells.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window shuffle back in assign:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    // allowed non-broadcast exchanges: Par.widen's round-robin on the
    // corpus + the SinglePartition collect_list on the (tiny) centroid
    // side; the old plan added a hashpartitioning shuffle of the
    // exploded corpus×nCells frame on top
    val shuffles = "Exchange".r.findAllIn(plan).size -
      "BroadcastExchange".r.findAllIn(plan).size
    assert(shuffles <= 2, s"unexpected exchanges in assign plan:\n$plan")
  }

  test("vector math: dot/norm/cosine agree with hand computation") {
    val df = Seq((Array(1f, 2f, 2f), Array(2f, 0f, 1f))).toDF("a", "b")
    val row = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.norm(col("a")).as("n"),
      VectorFunctions.l2Distance(col("a"), col("b")).as("l2"),
      VectorFunctions.cosine(col("a"), col("b")).as("c")).head()
    assert(row.getDouble(0) == 4.0)
    assert(row.getDouble(1) == 3.0)
    assert(math.abs(row.getDouble(2) - math.sqrt(1 + 4 + 1)) < 1e-12)
    assert(math.abs(row.getDouble(3) - 4.0 / (3.0 * math.sqrt(5.0))) < 1e-12)
  }

  test("cosine near-dup pairs finds planted neighbors via hyperplane LSH") {
    // plant near-dups: clone vectors with a tiny deterministic nudge
    val base = emb.where(col("vec_id") < 30)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val clones = base.where(col("id") < 10)
      .select((col("id") + 1000).as("id"),
        transform(col("vec"), x => x * lit(1.0001f)).cast("array<float>").as("vec"))
    val corpus2 = base.unionByName(clones)
    val pairsDf = Similarity
      .cosineNearDupPairs(corpus2, dim = 64, threshold = 0.99, bits = 16, bands = 8)
    val gotList = pairsDf.select("id_a", "id_b").as[(Long, Long)]
      .collect().toSeq
    val got = gotList.toSet
    val expected = (0L until 10L).map(i => (i, i + 1000)).toSet
    // banding with 8×2-bit chunks ⇒ scaled clones always collide
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
    // exactly-once: a scaled clone shares ALL 8 bands with its base, so
    // without canonical-band emission each pair would surface 8 times —
    // one row per pair proves the first-shared-band predicate works
    assert(gotList.size == got.size,
      s"band-duplicate pairs emitted: ${gotList.size} rows, ${got.size} pairs")
    // and the dedup must come from the join predicate, not a distinct
    // shuffle over the candidate set: no Aggregate anywhere in the plan
    val plan = pairsDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Aggregate"),
      s"distinct-style Aggregate back in the LSH pair plan:\n$plan")
  }

  test("k-means-trained centroids tie or beat the hash-sampled init on " +
      "planted clusters, and updates are exact micro-unit integers") {
    // 8 near-orthogonal anchors (max pairwise cosine ~0.5 on this
    // data), each with 12 ANGULAR perturbations (per-coordinate nudges
    // — a pure scaling would leave cosine unchanged and prove nothing)
    val anchors = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val clones = anchors
      .select(col("id"), col("vec"),
        explode(array((1 to 12).map(lit): _*)).as("j"))
      .select((col("id") * 100 + col("j") + 1000).as("id"),
        transform(col("vec"), (x, i) =>
          x.cast("double") + lit(0.02) *
            (((col("j") * 7 + i) % 5).cast("double") - lit(2.0)))
          .cast("array<float>").as("vec"))
    val corpus2 = anchors.unionByName(clones)

    val (cellsInit, centsInit) = Similarity.ivfAssign(corpus2, nCells = 8)
    val trained =
      Similarity.kmeansCentroids(corpus2, dim = 64, centsInit, iters = 3)
    val cellsTrained = Similarity.ivfAssignTo(corpus2, trained)

    def recall(cells: org.apache.spark.sql.DataFrame,
        cents: org.apache.spark.sql.DataFrame): Double = {
      val queries = anchors.select(col("id").as("qid"), col("vec").as("qvec"))
      val truth = Similarity.bruteForceTopK(corpus2, queries, k = 5)
        .select("qid", "id")
      val approx = Similarity.ivfTopK(cells, cents, queries, k = 5, nProbe = 1)
        .select("qid", "id")
      approx.join(truth, Seq("qid", "id")).count().toDouble / truth.count()
    }
    val rInit = recall(cellsInit, centsInit)
    val rTrained = recall(cellsTrained, trained)
    assert(rTrained >= rInit,
      s"training regressed recall: init=$rInit trained=$rTrained")
    assert(rTrained >= 0.8, s"trained recall too low: $rTrained")

    // micro-unit exactness: every trained centroid component is an
    // integral double (the per-cell BIGINT sum) — the property that
    // makes training order-independent and oracle-replayable
    val nonIntegral = trained
      .select(explode(col("cvec")).as("v"))
      .where(col("v") =!= floor(col("v"))).count()
    assert(nonIntegral == 0)
    assert(trained.count() == 8) // empty-cell retention keeps k fixed
  }

  test("disk-backed IVF index: cell-partitioned layout, probe equals " +
      "the in-memory path and prunes to the probed cells") {
    val corpus = emb.where(col("vec_id") < 200)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.where(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val (cells, cents) = Similarity.ivfAssign(corpus, nCells = 16)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-index").toString
    Similarity.writeIndex(cells, dir)

    // layout: one directory per cell
    val cellDirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(cellDirs.nonEmpty)

    val idx = spark.read.parquet(dir)
    val got = Similarity.ivfTopKIndexed(idx, cents, queries, k = 5, nProbe = 4)
    val want = Similarity.ivfTopK(cells, cents, queries, k = 5, nProbe = 4)
      .select("qid", "id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val gotRows = got.select("qid", "id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(gotRows == want)

    // dynamic partition pruning: the probe side's cell set reaches the
    // index scan as a runtime partition filter
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the index scan:\n$plan")
  }

  test("incremental index append: grown index equals a full rebuild, " +
      "probes unchanged; assignFit flags drift") {
    val base = emb.where(col("vec_id") < 150)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val delta = emb.where(col("vec_id").between(150, 199))
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val full = emb.where(col("vec_id") < 200)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = emb.where(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-append").toString

    Similarity.writeIndex(Similarity.ivfAssignTo(base, cents), dir)
    Similarity.appendIndex(delta, cents, dir)

    // assign(base) ∪ assign(delta) == assign(base ∪ delta): the grown
    // index is exactly the full rebuild
    val grown = spark.read.parquet(dir)
      .select("id", "cell").as[(Long, Long)].collect().toSet
    val rebuilt = Similarity.ivfAssignTo(full, cents)
      .select("id", "cell").as[(Long, Long)].collect().toSet
    assert(grown == rebuilt)

    // and a probe against the grown index equals the in-memory answer
    // over the full corpus
    val queries = emb.where(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val got = Similarity.ivfTopKIndexed(spark.read.parquet(dir), cents,
        queries, k = 5, nProbe = 4)
      .select("qid", "id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val want = Similarity.ivfTopK(Similarity.ivfAssignTo(full, cents),
        cents, queries, k = 5, nProbe = 4)
      .select("qid", "id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == want)

    // drift metric: the training slice fits its own centroids perfectly
    // (mean fit 1.0); orthogonal-ish junk vectors fit far worse
    val selfFit = Similarity.assignFit(
      cents.select(col("cid").as("id"), col("cvec").as("vec")), cents)
      .as[(Long, Long)].head()
    assert(selfFit._1 == 16L && selfFit._2 >= 16L * 999999,
      s"self-fit should be ~1.0/row, got $selfFit")
    val junk = spark.range(8).select(col("id"),
      transform(sequence(lit(1), lit(64)),
        i => when(i === (col("id") % 64 + 1).cast("int"), lit(-1.0))
          .otherwise(lit(0.0))).as("vec"))
    val junkFit = Similarity.assignFit(junk, cents).as[(Long, Long)].head()
    assert(junkFit._1 == 8L && junkFit._2 < selfFit._2 / 2,
      s"junk fit should be far below self fit: $junkFit vs $selfFit")
  }

  test("int8 quantized top-k: elements bounded, zero vectors safe, " +
      "top-1 recall tracks the exact path") {
    val corpus = emb.where(col("vec_id") < 300)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Similarity.quantizeUnit(corpus)
    // every element within the int8 budget
    assert(q.where(exists(col("qvec"), v => abs(v) > 127)).count() == 0)
    // a zero vector quantizes to zeros instead of erroring under ANSI
    val z = Similarity.quantizeUnit(
      Seq((1L, Seq.fill(64)(0.0f))).toDF("id", "vec"))
    assert(z.select(explode(col("qvec"))).as[Int].collect().forall(_ == 0))

    val queries = corpus.where(col("id") < 20)
    val exact = Similarity.bruteForceTopK(corpus, queries
        .select(col("id").as("qid"), col("vec").as("qvec")), k = 1)
      .select("qid", "id").as[(Long, Long)].collect().toMap
    val quant = Similarity.quantizedTopK(q, q.where(col("id") < 20), k = 1)
      .select("qid", "id").as[(Long, Long)].collect().toMap
    val agree = exact.keys.count(k => exact(k) == quant(k))
    assert(agree >= 14, // 1/127-step discretization: most top-1s survive
      s"quantized top-1 agreed on $agree/20 queries")
  }

  test("native dot Expression agrees bit-for-bit with the HOF fold") {
    val mismatches = emb.as("x").crossJoin(emb.as("y"))
      .where(col("x.vec_id") < 20 && col("y.vec_id") < 20)
      .select(
        VectorFunctions.dot(col("x.embedding"), col("y.embedding")).as("fast"),
        VectorFunctions.dotHof(col("x.embedding"), col("y.embedding")).as("ref"))
      .where(col("fast") =!= col("ref"))
    assert(mismatches.count() == 0)
  }

  test("native hyperplane signature agrees bit-for-bit with the HOF " +
      "reference, and its stage stays inside whole-stage codegen") {
    val mismatches = emb
      .select(
        VectorFunctions.hyperplaneSignature(col("embedding"), 64, 16).as("fast"),
        VectorFunctions.hyperplaneSignatureHof(col("embedding"), 64, 16).as("ref"))
      .where(col("fast") =!= col("ref"))
    assert(mismatches.count() == 0)
    // the HOF form knocks the stage out of codegen (janino method-size
    // limit); the native expression must not — its Project renders with
    // the `*(n)` whole-stage-codegen marker
    val plan = emb
      .select(VectorFunctions.hyperplaneSignature(col("embedding"), 64, 16))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("hamming64 counts differing bits") {
    val df = Seq((0L, 7L)).toDF("a", "b")
    assert(df.select(VectorFunctions.hamming64(col("a"), col("b")))
      .head().get(0).toString.toLong == 3L)
  }

  test("incremental cosine near-dup against a persisted hyperplane " +
      "index == one-shot pairs restricted to batch-involving pairs") {
    val slice = corpus.where(col("id") < 600)
    val batch = slice.where(col("id") % 5 === 0)
    val prior = slice.where(col("id") % 5 =!= 0)
    val idxPath = java.nio.file.Files
      .createTempDirectory("hp_idx").toString + "/index"
    Similarity.hyperplaneIndex(prior, dim = 64, bits = 16)
      .write.parquet(idxPath)
    val incremental = Similarity.cosineNearDupIncremental(
      prior, spark.read.parquet(idxPath), batch,
      dim = 64, threshold = 0.4, bits = 16, bands = 4)
      .select("id_a", "id_b", "cosine")
      .as[(Long, Long, Double)].collect().toSet
    val oneShot = Similarity.cosineNearDupPairs(
      slice, dim = 64, threshold = 0.4, bits = 16, bands = 4)
      .select("id_a", "id_b", "cosine")
      .as[(Long, Long, Double)].collect().toSet
      .filter(p => p._1 % 5 == 0 || p._2 % 5 == 0)
    assert(incremental == oneShot,
      s"missing: ${oneShot -- incremental}; extra: ${incremental -- oneShot}")
    assert(incremental.exists(p => (p._1 % 5 == 0) != (p._2 % 5 == 0)),
      "no cross corpus/batch pair — split exercises nothing")
  }
}
