package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("latestAtOrBefore picks newest right row at or before left ts") {
    val left = Seq(
      (1L, 100L, "e1"), // after r@50 → picks 50's value
      (1L, 50L, "e2"),  // exactly at r@50 → inclusive
      (1L, 10L, "e3"),  // before any right row → null
      (2L, 99L, "e4")   // key with no right rows → null
    ).toDF("uid", "us", "name")
    val right = Seq(
      (1L, 50L, 500L),
      (1L, 90L, 900L),
      (1L, 90L, 901L)   // tie on ts → larger pick wins
    ).toDF("uid", "us", "v")

    val got = AsOfJoin.latestAtOrBefore(left, right, "uid", "us", "v", "picked")
      .select("name", "picked").collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    assert(got("e1") === Some(901L))
    assert(got("e2") === Some(500L))
    assert(got("e3") === None)
    assert(got("e4") === None)
  }

  test("approx_count_distinct within declared error vs exact") {
    val li = graft.sources.Tables.lineitem(spark, sf0001)
    val exact = li.select("l_partkey").distinct().count().toDouble
    val approx = li.agg(
      org.apache.spark.sql.functions.approx_count_distinct("l_partkey", 0.02))
      .head().getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.1)
  }
}
