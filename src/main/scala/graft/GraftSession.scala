package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory with the engine's scale-oriented defaults.
  *
  * Local runs use local[N]; on a real cluster the same confs apply minus
  * the master. AQE is on for runtime re-planning (skew joins, coalesced
  * shuffle partitions); the broadcast threshold covers all dimension
  * tables in the star schema so fact-side joins never shuffle the fact.
  */
object GraftSession {
  def builder(appName: String, cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cores]")
      // the engine's Catalyst pieces (codegen'd functions, the named
      // cow-catalog conversion rule) + the cow TableCatalog itself, so
      // `cow.db.table` resolves in plain SQL on every engine session
      .withExtensions(new GraftExtensions)
      .config("spark.sql.catalog.cow",
        classOf[graft.catalog.CowCatalog].getName)
      .config("spark.sql.catalog.cow.warehouse",
        sys.env.getOrElse("SPARK_GRAFT_COW_WAREHOUSE",
          "/tmp/graft-cow-warehouse"))
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // testdata events.parquet carries TIMESTAMP(NANOS) which the parquet
      // reader rejects; read as long and convert in Tables.load.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // testdata timestamps are timezone-less micros; read them as the
      // session-UTC TIMESTAMP (matching the DuckDB oracle, which treats
      // them as naive-UTC) instead of TIMESTAMP_NTZ.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", "/tmp/graft-warehouse"))
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = builder(appName, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
