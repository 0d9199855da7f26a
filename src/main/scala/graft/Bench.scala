package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line {"metric":...,"queries":{name:sec}}.
  *
  * Contamination defenses (a shared machine under load has produced
  * phantom 3-10x "regressions" in past rounds):
  *  - per-query isolation: clearCache + blocking unpersist + GC before
  *    every timed rep;
  *  - adaptive best-of-2: any query whose first rep exceeds
  *    [[HeavyCutoffSec]] gets a second rep and reports the min —
  *    a transient load spike then only poisons one of the two;
  *  - telemetry: /proc/loadavg before/after the battery and process
  *    CPU-vs-wall ratio go into the JSON line, so a poisoned run is
  *    self-identifying (low cpu_wall_ratio + high loadavg ⇒ the
  *    machine, not the code).
  */
object Bench {
  /** First-rep duration above which a query earns a second rep. */
  val HeavyCutoffSec = 2.0

  /** Emit the battery's result: the FULL line (per-query seconds,
    * loadavg, errors) goes to `bench_out.json` in cwd; stdout gets a
    * SHORT summary line (total, failures, top-5 slowest, telemetry).
    * Split because a 130-query line outgrows log tail captures — the
    * round 8 and 9 driver artifacts both lost their payload to exactly
    * that truncation (`parsed: null`); the short line survives any
    * tail, and the file has no tail at all.
    *
    * SPARK_GRAFT_FULL_STDOUT=1 restores the full line on stdout (the
    * per-query isolation harness parses its children that way).
    */
  private def emit(fullLine: String, shortLine: String): Unit = {
    val full = sys.env.get("SPARK_GRAFT_FULL_STDOUT")
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))
    println(if (full) fullLine else shortLine)
    Console.out.flush()
    try {
      val w = new java.io.PrintWriter("bench_out.json", "UTF-8")
      try w.println(fullLine) finally w.close()
      // file twin of the stdout summary: a log-tail-proof copy the
      // driver (or a human) can read without parsing sbt output at all
      val s = new java.io.PrintWriter("bench_summary.json", "UTF-8")
      try s.println(shortLine) finally s.close()
    } catch { case _: Throwable => () } // stdout copy already out
  }

  /** The short stdout line: everything a round-over-round compare
    * needs without the per-query payload.
    */
  private def shortLineOf(
      total: Double, nFailed: Int, nQueries: Int,
      perQuery: Seq[(String, Double)], isolated: Boolean, sfDir: String,
      loadBefore: Double, loadAfter: Double, ratio: Double): String = {
    val top5 = perQuery.filter(_._2 >= 0).sortBy(-_._2).take(5)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    s"""{"metric":"total","value":$total,"unit":"sec","isolated":$isolated,"n_queries":$nQueries,"n_failed":$nFailed,"top5":$top5,"sf":"$sfDir","loadavg_before":$loadBefore,"loadavg_after":$loadAfter,"cpu_wall_ratio":$ratio,"detail":"bench_out.json"}"""
  }

  private def loadavg(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.getLines().next().split(" ")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  private def processCpuSec(): Double =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      .getProcessCpuTime / 1e9
    catch { case _: Throwable => -1.0 }

  // ---------------------------------------------------------------------
  // Process isolation (SPARK_GRAFT_ISOLATE=1): one fresh JVM per query.
  // Same-JVM batteries share JIT state, GC pressure, shuffle dirs and
  // page cache — a heavy query can poison its successors' timings even
  // with the clearCache+GC hygiene below (observed as ±50% round-over-
  // round swings in driver numbers). A fresh JVM per query removes every
  // shared-process channel; what remains (machine load) is visible in
  // the per-query loadavg. Cost: each child pays full session bring-up
  // + table warmup, so this mode is for deep-dive runs and
  // SPARK_GRAFT_ONLY subsets, not the default battery.
  // ---------------------------------------------------------------------
  private val Jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private val Num = "(-?[0-9.]+(?:[eE][+-]?[0-9]+)?)"

  /** Run one query in a fresh child JVM; returns (sec, loadavg, err,
    * childCpuSec) parsed from the child's own JSON line.
    */
  private def isolatedRep(
      name: String, sfDir: String, cpus: String,
      forcedReps: Option[Int]): (Double, Double, Option[String], Double) = {
    val cmd = Seq(s"${sys.props("java.home")}/bin/java") ++ Jdk17AddOpens ++
      Seq(s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", sys.props("java.class.path"), "graft.Bench")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
    pb.environment().put("SPARK_GRAFT_CPUS", cpus)
    pb.environment().put("SPARK_GRAFT_ONLY", name)
    pb.environment().remove("SPARK_GRAFT_ISOLATE")
    // the parent parses the child's FULL line off its stdout
    pb.environment().put("SPARK_GRAFT_FULL_STDOUT", "1")
    // the settle gate runs ONCE for the battery (in this parent);
    // children must not each wait out the load the battery itself
    // generates — that would add minutes per query and make the
    // per-query loadavg telemetry read post-settle instead of truth
    pb.environment().put("SPARK_GRAFT_SETTLE", "0")
    forcedReps.foreach(r =>
      pb.environment().put("SPARK_GRAFT_REPS", r.toString))
    // child stderr (Spark logs) flows through; an un-drained pipe would
    // fill and deadlock the child
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream)
      .getLines().toList
    val code = proc.waitFor()
    out.find(_.startsWith("{\"metric\"")) match {
      case None =>
        (-1.0, loadavg(), Some(s"isolated child produced no bench line (exit=$code)"), 0.0)
      case Some(line) =>
        val q = java.util.regex.Pattern.quote(name)
        // "queries" precedes "query_loadavg" in the line, so the first
        // match is the seconds, the second the loadavg
        val hits = ("\"" + q + "\":" + Num).r
          .findAllMatchIn(line).map(_.group(1).toDouble).toList
        val sec = hits.headOption.getOrElse(-1.0)
        val load = hits.drop(1).headOption.getOrElse(-1.0)
        val err =
          if (sec < 0)
            ("\"" + q + "\":(\"(?:[^\"\\\\]|\\\\.)*\")").r
              .findFirstMatchIn(line).map(_.group(1))
              .orElse(Some("child reported failure"))
          else None
        val cpu = ("\"battery_cpu_sec\":" + Num).r
          .findFirstMatchIn(line).map(_.group(1).toDouble).getOrElse(0.0)
        (sec, load, err, math.max(cpu, 0.0))
    }
  }

  /** Settle gate: the official battery usually runs right after a
    * heavy verify pass, so /proc/loadavg is still elevated and the
    * first timed queries read slow for machine reasons, not code
    * reasons (loadavg 2→14 observed on past driver runs). Wait —
    * bounded — for the 1-minute load to drop below `threshold` before
    * timing anything. The JSON line's loadavg_before then certifies a
    * quiet run; a battery that starts loaded anyway (timeout hit) is
    * still self-identifying. Opt out: SPARK_GRAFT_SETTLE=0; tune:
    * SPARK_GRAFT_SETTLE_LOAD / SPARK_GRAFT_SETTLE_MAX_SEC.
    */
  private def settle(): Unit = {
    if (sys.env.get("SPARK_GRAFT_SETTLE").exists(v =>
      v == "0" || v.equalsIgnoreCase("false"))) return
    val threshold = sys.env.get("SPARK_GRAFT_SETTLE_LOAD")
      .flatMap(_.toDoubleOption).getOrElse(1.5)
    val maxSec = sys.env.get("SPARK_GRAFT_SETTLE_MAX_SEC")
      .flatMap(_.toIntOption).getOrElse(180)
    val deadline = System.nanoTime() + maxSec * 1000000000L
    var l = loadavg()
    while (l >= threshold && l >= 0 && System.nanoTime() < deadline) {
      Thread.sleep(5000)
      l = loadavg()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    settle()
    val isolate = sys.env.get("SPARK_GRAFT_ISOLATE")
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))
    if (isolate) {
      val only = sys.env.get("SPARK_GRAFT_ONLY")
        .map(_.split(",").map(_.trim).toSet)
      val forcedReps = sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption)
      val loadBefore = loadavg()
      val wall0 = System.nanoTime()
      val results = SparkEntry.queries.keys.toSeq.sorted
        .filter(n => only.forall(_.contains(n)))
        .map { name =>
          val (sec, load, err, cpu) =
            isolatedRep(name, sfDir, cpus, forcedReps)
          (name, sec, load, err, cpu)
        }
      val wallSec = (System.nanoTime() - wall0) / 1e9
      val cpuSec = results.map(_._5).sum
      val qs = results.map { case (k, v, _, _, _) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val qload = results.map { case (k, _, l, _, _) => s"\"" + k + "\":" + l }
        .mkString("{", ",", "}")
      val errs = results.collect { case (k, _, _, Some(e), _) =>
        s"\"" + k + "\":" + (if (e.startsWith("\"")) e else JsonUtil.escape(e))
      }.mkString("{", ",", "}")
      val nFailed = results.count(_._4.isDefined)
      val total = results.collect { case (_, v, _, None, _) => v }.sum
      val ratio = if (wallSec > 0) cpuSec / wallSec else -1.0
      val loadAfterI = loadavg()
      emit(
        s"""{"metric":"total","value":$total,"unit":"sec","isolated":true,"n_failed":$nFailed,"errors":$errs,"queries":$qs,"query_loadavg":$qload,"sf":"$sfDir","loadavg_before":$loadBefore,"loadavg_after":$loadAfterI,"battery_wall_sec":$wallSec,"battery_cpu_sec":$cpuSec,"cpu_wall_ratio":$ratio}""",
        shortLineOf(total, nFailed, results.size,
          results.map(r => (r._1, r._2)), isolated = true, sfDir,
          loadBefore, loadAfterI, ratio))
      return
    }
    // measured BEFORE session bring-up + warmup: those are this
    // process's own (expected) load — loadavg_before certifies what
    // the MACHINE looked like when the battery started
    val loadBefore = loadavg()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.catalog.cow",
        classOf[graft.catalog.CowCatalog].getName)
      .config("spark.sql.catalog.cow.warehouse",
        sys.env.getOrElse("SPARK_GRAFT_COW_WAREHOUSE",
          "/tmp/graft-cow-warehouse"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JVM/codegen/FileIndex init so the first timed query isn't
    // charged for session bring-up
    Tables.names.foreach { n =>
      try Tables.load(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    // SPARK_GRAFT_ONLY=q1,q2 narrows the run while iterating on one query
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // SPARK_GRAFT_REPS=n forces best-of-n per query (non-numeric values
    // fall back rather than aborting the battery). Unset → adaptive:
    // 1 rep for cheap queries, best-of-2 when the first rep ran longer
    // than HeavyCutoffSec (the heavy dedup/CC family — exactly the
    // queries a load spike distorts most in absolute seconds).
    val forcedReps = sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption)
    val cpu0 = processCpuSec()
    val wall0 = System.nanoTime()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      // fail LOUD, not fast: a throwing query must never be timed as a
      // (suspiciously quick) success — that reads as a speedup in the
      // round-over-round bench compare. Error ⇒ -1.0 sentinel in
      // `queries` + the exception in `errors`.
      var err: Option[String] = None
      def oneRep(): Double = {
        // isolate queries from each other: drop cached/pinned blocks
        // left by the previous query and let the JVM settle, so one
        // heavy query can't poison the next one's timing (round 2's
        // ngram 44 s artifact was same-JVM contention, not a plan
        // regression — isolated it ran 8.5 s). clearCache only covers
        // catalog-registered caches; Par.pin's localCheckpoint blocks
        // are plain persisted RDDs, so unpersist those explicitly and
        // BLOCKING (async ContextCleaner could still be evicting the
        // previous query's multi-GB blocks inside our timed region)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            err = Some(s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").takeWhile(_ != '\n').take(300))
        }
        (System.nanoTime() - t0) / 1e9
      }
      val first = oneRep()
      val secs =
        if (err.isDefined) -1.0
        else {
          val reps =
            forcedReps.getOrElse(if (first > HeavyCutoffSec) 2 else 1).max(1)
          val all = first +: (2 to reps).map(_ => oneRep())
          // a LATER rep may have thrown: its elapsed-to-throw time would
          // win the min() as a phantom speedup — re-check before trusting
          if (err.isDefined) -1.0 else all.min
        }
      // per-query loadavg: one poisoned entry is attributable to machine
      // load without re-running the whole battery under a judge
      (name, secs, loadavg(), err)
    }
    // wall/cpu snapshot BEFORE the load-gate block: the gate's settle
    // sleep (~0 CPU, up to 120 s) and its reruns would otherwise
    // depress cpu_wall_ratio — the exact signature this telemetry
    // documents as "contaminated run", misread onto a healthy gated one
    val wallSec = (System.nanoTime() - wall0) / 1e9
    val cpuNow = processCpuSec()
    // PER-QUERY LOAD GATE (round-18): any query whose loadavg reading
    // exceeded the gate re-runs ONCE at battery end, after a bounded
    // settle wait, and reports min(first, rerun) — a transient external
    // spike then cannot poison the battery artifact at all. The gate
    // default (10) is calibrated ABOVE the battery's own self-load
    // profile: on an idle host this 203-query battery's 1-minute
    // loadavg readings reach ~9 purely from its own local[32] bursts
    // (p50 ≈ 3.2), while the contaminated driver artifacts of rounds
    // 16-17 spiked to 14.5-24.8 — gating below ~9 would stall on our
    // own load. Both timings are recorded under "regated" so the
    // artifact stays honest about what happened. SPARK_GRAFT_LOADGATE
    // tunes; 0 disables.
    val gate = sys.env.get("SPARK_GRAFT_LOADGATE")
      .flatMap(_.toDoubleOption).getOrElse(10.0)
    val regated: Map[String, (Double, Double, Double)] =
      if (gate <= 0) Map.empty
      else {
        val hot = results.filter(r => r._4.isEmpty && r._3 > gate)
        if (hot.isEmpty) Map.empty
        else {
          val deadline = System.nanoTime() + 120L * 1000000000L
          while (loadavg() > gate && System.nanoTime() < deadline)
            Thread.sleep(5000)
          hot.map { case (name, first, _, _) =>
            spark.catalog.clearCache()
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = true))
            System.gc()
            var reErr: Option[String] = None
            val t0 = System.nanoTime()
            try { SparkEntry.queries(name)(spark, sfDir).count() }
            catch { case e: Throwable =>
              reErr = Some(e.getClass.getSimpleName) }
            val re = (System.nanoTime() - t0) / 1e9
            // a throwing rerun keeps the first timing (it succeeded);
            // min() otherwise — the quieter read is the honest one.
            // The rerun's OWN loadavg rides along so the chosen timing
            // is auditable (ADVICE r18: a min() pick from a rerun that
            // itself ran loaded would otherwise be indistinguishable)
            name -> (first, if (reErr.isEmpty) re else first, loadavg())
          }.toMap
        }
      }
    val patched = results.map { case (k, v, l, e) =>
      (k, regated.get(k).map(t => math.min(v, t._2)).getOrElse(v), l, e)
    }
    // -1 sentinel must survive: without it, an unavailable MXBean would
    // report cpu 0.0 / ratio 0.0 — indistinguishable from "maximally
    // contaminated" under the documented reading of this telemetry
    val cpuSec = if (cpu0 < 0 || cpuNow < 0) -1.0 else cpuNow - cpu0
    val loadAfter = loadavg()
    // cpu_wall_ratio: this JVM's CPU seconds per wall second over the
    // battery. On a quiet 32-core box heavy queries push it well above
    // 1; a contaminated run shows it depressed WITH loadavg elevated.
    val ratio = if (wallSec > 0 && cpuSec >= 0) cpuSec / wallSec else -1.0
    val qs = patched.map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qload = patched.map { case (k, _, l, _) => s"\"" + k + "\":" + l }
      .mkString("{", ",", "}")
    val errs = patched.collect { case (k, _, _, Some(e)) =>
      s"\"" + k + "\":" + JsonUtil.escape(e)
    }.mkString("{", ",", "}")
    // both timings of every load-gated re-run, so the artifact is
    // explicit about which entries the gate touched and by how much
    val regatedJson = regated.toSeq.sortBy(_._1).map {
      case (k, (first, re, reLoad)) =>
        s"\"" + k + "\":{\"first\":" + first + ",\"rerun\":" + re +
          ",\"rerun_loadavg\":" + reLoad + "}"
    }.mkString("{", ",", "}")
    val nFailed = patched.count(_._4.isDefined)
    // failed queries are EXCLUDED from total (they contribute no honest
    // seconds); n_failed + errors make the breakage unmissable
    val total = patched.collect { case (_, v, _, None) => v }.sum
    emit(
      s"""{"metric":"total","value":$total,"unit":"sec","isolated":false,"n_failed":$nFailed,"errors":$errs,"queries":$qs,"query_loadavg":$qload,"load_gate":$gate,"regated":$regatedJson,"sf":"$sfDir","loadavg_before":$loadBefore,"loadavg_after":$loadAfter,"battery_wall_sec":$wallSec,"battery_cpu_sec":$cpuSec,"cpu_wall_ratio":$ratio}""",
      shortLineOf(total, nFailed, patched.size,
        patched.map(r => (r._1, r._2)), isolated = false, sfDir,
        loadBefore, loadAfter, ratio))
    spark.stop()
  }
}
