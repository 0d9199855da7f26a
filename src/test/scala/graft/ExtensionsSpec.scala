package graft

import org.apache.spark.sql.SparkSession
import graft.functions.FingerprintExpr

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects graft_fingerprint into a fresh session") {
    // getOrCreate returns the existing session (and skips extensions)
    // unless active/default are cleared; the new session reuses the
    // running SparkContext but applies the configured extensions.
    val prev = spark // force TestSpark init before clearing
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // (the `spark.sql.extensions=graft.GraftExtensions` conf form works
    // too, but only on a fresh SparkContext — it's a static conf)
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val got = s2.sql("SELECT graft_fingerprint('hello world') AS fp")
        .head().getLong(0)
      assert(got == FingerprintExpr.hash("hello world"))
      // vector functions resolve in plain SQL too
      val dot = s2.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head().getDouble(0)
      assert(dot == 11.0)
      val sig = s2.sql(
        "SELECT graft_hyperplane_sig(array(1.0D, -2.0D), 2, 4) AS s")
        .head().getLong(0)
      // independently: bit p set iff c(p,0)·1 + c(p,1)·(-2) ≥ 0
      val expect = (0 until 4).map { p =>
        val d = graft.functions.HyperplaneSigExpr.planeComponent(p, 0) * 1.0 +
          graft.functions.HyperplaneSigExpr.planeComponent(p, 1) * -2.0
        if (d >= 0) 1L << p else 0L
      }.reduce(_ | _)
      assert(sig == expect)
      // non-literal dim fails loud (it shapes the generated code)
      val e = intercept[Exception] {
        s2.sql("SELECT graft_hyperplane_sig(array(1.0D), 1 + 1, 4)").collect()
      }
      assert(e.getMessage.contains("INTEGER literal"))
      // the dedup signature expressions resolve in SQL and agree with
      // their Scala-side statics
      val sh = s2.sql(
        "SELECT graft_simhash64(array('alpha', 'beta', 'beta')) AS s")
        .head().getLong(0)
      assert(sh != 0L)
      val mh = s2.sql(
        "SELECT graft_minhash_sigs(array('aaaaaaaa', 'bbbbbbbb'), 4) AS m")
        .head().getSeq[Long](0)
      assert(mh.size == 4)
      assert(s2.sql(
        "SELECT graft_minhash_sigs(CAST(array() AS array<string>), 4) AS m")
        .head().isNullAt(0),
        "empty shingle array must yield NULL")
    } finally {
      // keep the shared context alive for other suites; restore session
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
