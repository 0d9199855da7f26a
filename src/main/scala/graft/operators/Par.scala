package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism + materialization hygiene for CPU-heavy per-row operators
  * (shingling, hashing, vector math).
  *
  * A small parquet table arrives as ONE input split, so an expensive
  * map stage (e.g. 1.3M substring+hash ops for 8-gram shingles) runs
  * on a single core while 31 idle — measured 4-5 s where the same work
  * takes ~0.3 s widened. At production scale the scan already has
  * thousands of splits and `widen` is a no-op; it only pays a tiny
  * round-robin shuffle when the input is narrower than the cluster.
  */
object Par {

  /** Repartition up to the session default parallelism iff the plan
    * currently has fewer partitions. Safe before any per-row map work;
    * do not rely on input ordering afterwards.
    *
    * Call ONCE at an operator's entry point and thread the widened
    * frame through its stages — the partition-count probe plans the
    * frame, and widening the same input in two subtrees pays two
    * independent round-robin shuffles of it.
    */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Materialize `df` NOW and cut its lineage, so a frame referenced by
    * several downstream subtrees (self-joins, iterative loops) is
    * computed exactly once and can never be silently recomputed from
    * scratch (observed: a 10 s pair pipeline ballooning a bench run to
    * 190+ s when a plain cache was evicted mid-iteration).
    *
    * Durability: when the application has a reliable checkpoint dir
    * configured (`SparkContext.setCheckpointDir`), use a reliable
    * `checkpoint` — on a real cluster `localCheckpoint` blocks live
    * only on their executors, so any executor loss or dynamic-
    * allocation decommission kills the job. Without a checkpoint dir
    * (local bench/test runs) fall back to `localCheckpoint`.
    *
    * Contract notes for callers:
    *  - EAGER: pin runs the full upstream pipeline NOW. Operators built
    *    on it (minhash/ngram/simhash pairs, cosine near-dup, connected
    *    components) execute Spark jobs at construction, not at the
    *    first action — plan-only inspection of those operators pays the
    *    compute, and failures surface at construction.
    *  - CLEANUP: reliable checkpoint files are deleted by Spark only
    *    when `spark.cleaner.referenceTracking.cleanCheckpoints=true`
    *    (default false) — a long-running app with a checkpoint dir MUST
    *    set it, or each operator call leaks checkpoint files for the
    *    application lifetime. localCheckpoint blocks are reclaimed by
    *    the ContextCleaner on GC (or explicit blocking unpersist, as
    *    Bench does between queries).
    *
    * Parallelism: the eager materialization runs through AQE, which
    * coalesces a small-byte output to ONE partition — and every
    * downstream consumer (candidate self-joins, verify intersects)
    * would inherit that single partition and run on one core
    * (measured: a 12 s single-task stage inside an 18 s query). So the
    * pinned frame is re-widened: the round-robin exchange over the
    * already-materialized blocks is cheap, the restored parallelism is
    * not.
    */
  def pin(df: DataFrame): DataFrame = {
    val ck =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    widen(ck)
  }

  /** As [[pin]] but ALWAYS a local checkpoint, even when a reliable
    * checkpoint dir is configured. For short-lived intermediates inside
    * an iterative loop: each round's table is superseded by the next,
    * so durability buys nothing (an executor loss fails the query,
    * which retries whole), while a reliable checkpoint per round would
    * write — and with default cleaner settings leak — one
    * distributed-FS file set per iteration.
    */
  def pinLocal(df: DataFrame): DataFrame =
    widen(df.localCheckpoint(eager = true))
}
