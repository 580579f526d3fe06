package graft.operators

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("funnel: conversion windows, pre-entry targets, and non-entrants") {
    val ev = Seq(
      // u1: converts inside the window (entry 100, target 150)
      (1L, 100L, "signup"), (1L, 150L, "purchase"),
      // u2: target exists but only BEFORE the entry → unconverted, null to
      (2L, 100L, "signup"), (2L, 50L, "purchase"),
      // u3: first post-entry target lands OUTSIDE the window
      (3L, 100L, "signup"), (3L, 5000L, "purchase"),
      // u4: never entered (purchase only) → absent from the funnel
      (4L, 10L, "purchase"),
      // u5: second signup later must not move the entry point
      (5L, 100L, "signup"), (5L, 400L, "signup"), (5L, 200L, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = TimeSeries.funnel(ev, "user_id", "ts", "event_type",
        "signup", "purchase", windowUnits = 1000L)
      .select("user_id", "from_us", "to_us", "converted")
      .as[(Long, Long, Option[Long], Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 100L, Some(150L), 1L),
      (2L, 100L, None, 0L),
      (3L, 100L, Some(5000L), 0L),
      (5L, 100L, Some(200L), 1L)))
  }

  test("cohortRetention buckets by first touch and dedups within a cell") {
    val ev = Seq(
      // u1: first in period 0, active again in periods 1 (twice) and 2
      (1L, 5L), (1L, 12L), (1L, 17L), (1L, 25L),
      // u2: first in period 0, never returns
      (2L, 9L),
      // u3: first in period 1, active in period 2
      (3L, 14L), (3L, 29L))
      .toDF("user_id", "ts")
    val got = TimeSeries.cohortRetention(ev, "user_id", "ts", periodUnits = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (0L, 0L, 2L),  // u1+u2 in their own cohort period
      (0L, 1L, 1L),  // u1 back next period (two events, ONE user)
      (0L, 2L, 1L),  // u1 again
      (1L, 0L, 1L),  // u3's cohort
      (1L, 1L, 1L))) // u3 back
  }

  test("cohortRetention floors pre-epoch timestamps like DuckDB `//`") {
    // ts=-5 with period 10 must land in period -1 (floor), not period 0
    // (Spark div truncation) — offsets then stay non-negative
    val ev = Seq((1L, -5L), (1L, 5L)).toDF("user_id", "ts")
    val got = TimeSeries.cohortRetention(ev, "user_id", "ts", periodUnits = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((-1L, 0L, 1L), (-1L, 1L, 1L)))
  }

  test("rollingAnomaly flags a spike after a full constant window only") {
    val rows = // key a: constant 5.0 then a spike; early rows lack a window
      Seq(("a", 1L, 1L, 5.0), ("a", 2L, 2L, 5.0), ("a", 3L, 3L, 5.0),
        ("a", 4L, 4L, 5.0), ("a", 5L, 5L, 50.0), ("a", 6L, 6L, 5.0))
        .toDF("k", "t", "id", "v")
    val got = TimeSeries.rollingAnomaly(rows, "k", "t", "id", "v", n = 3)
      .select("id", "n_prev", "anomaly")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 0L, 0L), (2L, 1L, 0L), (3L, 2L, 0L), // partial windows never flag
      (4L, 3L, 0L),                             // constant in, constant out
      (5L, 3L, 1L),                             // spike over zero-variance window
      (6L, 3L, 0L)))  // 5 vs {5,5,50}: μ=20, σ≈21.2 → |x-μ|=15 < 2σ, no flag
  }

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

  test("fillForward: LOCF carries the last observed value across gaps, " +
      "picks deterministically within a bucket") {
    // step 10: group a observes buckets 0 (two events — max event_id 7
    // wins), 3; buckets 1-2 are gaps carrying 2.5
    val df = Seq(
      ("a", 5L, 1.5d, 3L), ("a", 7L, 2.5d, 7L), ("a", 35L, 9.0d, 9L),
      ("b", 101L, 4.0d, 1L))
      .toDF("g", "t", "v", "id")
    val got = TimeSeries.fillForward(df, "g", "t", "v", "id",
        stepUnits = 10L)
      .as[(String, Long, Option[Double], Double)].collect().toSet
    assert(got === Set(
      ("a", 0L, Some(2.5d), 2.5d),
      ("a", 1L, None, 2.5d),
      ("a", 2L, None, 2.5d),
      ("a", 3L, Some(9.0d), 9.0d),
      ("b", 10L, Some(4.0d), 4.0d)))
  }
}
