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
}
