package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism hygiene for CPU-heavy per-row operators (shingling,
  * hashing, vector math).
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
    */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
