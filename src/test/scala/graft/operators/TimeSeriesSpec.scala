package graft.operators

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("resample fills gaps with zeros over each group's own span") {
    // group a occupies buckets 0 and 3 (step 10) → grid 0..3 with explicit
    // zeros at 1 and 2; group b has a single bucket → single row, no
    // bleed-over from a's span
    val df = Seq(("a", 5L), ("a", 7L), ("a", 35L), ("b", 102L)).toDF("g", "t")
    val got = TimeSeries.resampleCounts(df, "g", "t", stepUnits = 10L)
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", 0L, 2L), ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L),
      ("b", 10L, 1L)))
    intercept[IllegalArgumentException](
      TimeSeries.resampleCounts(df, "g", "t", 0L))
  }

  test("sessionize splits at gaps strictly greater than the gap parameter") {
    // key a: 0,5,10 | 25,26 (gap 15 > 10 splits); a gap of EXACTLY 10
    // does NOT split (strict >); key b independent
    val df = Seq(("a", 0L), ("a", 5L), ("a", 10L), ("a", 25L), ("a", 26L),
      ("b", 100L)).toDF("k", "t")
    val got = TimeSeries.sessionize(df, "k", "t", gapUnits = 10L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", 0L, 3L, 10L),   // events 0,5,10: 10-0 gap allowed (not strict)
      ("a", 25L, 2L, 1L),
      ("b", 100L, 1L, 0L)))
  }

  test("sessionize: duplicate timestamps share a session, boundaries exact") {
    val df = Seq(("u", 0L), ("u", 0L), ("u", 0L), ("u", 11L)).toDF("k", "t")
    val got = TimeSeries.sessionize(df, "k", "t", gapUnits = 10L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("u", 0L, 3L, 0L), ("u", 11L, 1L, 0L)))
  }
}
