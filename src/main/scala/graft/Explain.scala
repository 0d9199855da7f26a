package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("explain")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("j1_fact_enrich", "a2_thin_layer_agg", "dedup_exact", "asof_join")
    for (name <- names) {
      println(s"========== $name ==========")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.treeString.take(4000))
    }
    spark.stop()
  }
}
