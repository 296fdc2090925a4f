package graft.operators

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val trades = Seq(
    (1L, "A", 100L), (2L, "A", 205L), (3L, "A", 300L), (4L, "B", 150L),
    (5L, "C", 50L))
    .toDF("trade_id", "sym", "t")

  private lazy val quotes = Seq(
    ("A", 90L, 1.0), ("A", 200L, 2.0), ("A", 205L, 3.0), ("A", 400L, 4.0),
    ("B", 100L, 5.0))
    .toDF("sym", "t", "px")

  test("asofJoin picks the latest right row at-or-before each left row") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "t",
        Seq("px"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(1L) === Some(1.0)) // 100 → quote@90
    assert(out(2L) === Some(3.0)) // tie at 205 matches
    assert(out(3L) === Some(3.0)) // 300 → quote@205, not 400
    assert(out(4L) === Some(5.0)) // B 150 → quote@100
    assert(out(5L) === None)      // C has no quotes
  }

  test("asofJoin keeps every left row exactly once") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "t",
      Seq("px"))
    assert(out.count() === trades.count())
    assert(out.select("trade_id").distinct().count() === trades.count())
  }
}
