package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile
import graft.functions.TextFunctions

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profileExact reports nulls, distincts and numeric bounds per column") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None), (None, Some("a")))
      .toDF("num", "str")
    val p = Profile.profileExact(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.toString.toLong))).toMap
    assert(p("num") == ((3L, 1L, 2L, Some(1000000L))))
    assert(p("str") == ((3L, 1L, 1L, None)))
  }

  test("approx profile agrees with exact on small-cardinality data") {
    val df = Tables.load(spark, sfDir, "nation")
    val exact = Profile.profileExact(df)
      .select("col_name", "n_rows", "n_nulls").collect().toSet
    val approx = Profile.profile(df)
      .select("col_name", "n_rows", "n_nulls").collect().toSet
    assert(exact == approx)
  }

  test("redactPii scrubs emails, phones and long digit runs") {
    val out = Seq(
      "write to alice.smith+x@corp.example.com now",
      "call +44 (20) 1234 5678 today",
      "card 4111111111111111 expires",
      "clean text stays clean")
      .toDF("t").select(TextFunctions.redactPii(col("t")))
      .as[String].collect().toSeq
    assert(out(0) == "write to <EMAIL> now")
    assert(out(1) == "call <PHONE> today")
    assert(out(2) == "card <NUM> expires")
    assert(out(3) == "clean text stays clean")
  }

  test("histogram: top edge closed, NULLs excluded, degenerate " +
      "single-value column lands in bin 0") {
    import graft.operators.Profile
    val df = Seq(Some(0.0), Some(5.0), Some(10.0), None).toDF("v")
    val bins = Profile.histogram(df, "v", 10)
      .as[(Int, Long)].collect().toMap
    assert(bins == Map(0 -> 1L, 5 -> 1L, 9 -> 1L)) // max → last bin
    val flat = Profile.histogram(Seq(7.0, 7.0).toDF("v"), "v", 10)
      .as[(Int, Long)].collect().toMap
    assert(flat == Map(0 -> 2L))
  }

  test("winsorize clips to the quantile bounds and leaves NULLs NULL") {
    import graft.operators.Normalize
    val df = (Seq.tabulate(99)(i => Some((i + 1).toDouble)) :+
      Some(1000000.0) :+ Option.empty[Double]).toDF("v")
    val out = Normalize.winsorize(df, "v", 0.05, 0.95)
    assert(out.where(col("v").isNull).count() == 1) // NULL survives
    val mx = out.agg(max("v")).as[Double].head()
    assert(mx < 1000.0, s"outlier not clipped: $mx") // p95 of ~1..100
    assert(out.count() == df.count()) // winsorize never drops rows
  }
}
