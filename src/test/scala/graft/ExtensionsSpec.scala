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
    } finally {
      // keep the shared context alive for other suites; restore session
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
