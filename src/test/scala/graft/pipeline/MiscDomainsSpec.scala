package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.MiscDomains._

class MiscDomainsSpec extends SparkSpec {

  test("finance: composite symbol+day join, signed P&L") {
    val pnl = Finance.markToMarket(spark).collect()
      .map(r => r.getLong(0) -> r.getDecimal(4).doubleValue()).toMap
    assert(pnl(1L) === 200.0)   // BUY 100 @10, close 12 → +200
    assert(pnl(2L) === 20.0)    // SELL 40 @12.50, close 12 → +20
    assert(pnl(3L) === -40.0)   // BUY 200 @5, close 4.80 → −40
    assert(pnl(4L) === 20.0)    // SELL 200 @4.50, close 4.40 → +20
    assert(pnl(5L) === 25.0)    // BUY 50 @11, close 11.50 → +25
  }

  test("gov311: TIMESTAMPADD due dates and SLA rates; open requests excluded from rate") {
    val rows = Gov311.slaCompliance(spark).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(rows("POTHOLE") === ((2L, 0L, Some(0.5))))       // 1 of 2 on time
    assert(rows("GRAFFITI") === ((2L, 1L, Some(1.0))))      // open one not counted
    assert(rows("STREETLIGHT") === ((1L, 0L, Some(1.0))))   // boundary: closed exactly at due
  }

  test("insurance: month-key join, guarded loss ratio") {
    val rows = Insurance.monthlyLossRatio(spark).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(7)) ->
        (r.getDouble(2), r.getDouble(3), r.getLong(4), r.getDouble(5))).toMap
    assert(rows(("P1", "2025-07")) === ((1000.0, 750.0, 2L, 0.75)))
    assert(rows(("P2", "2025-08")) === ((500.0, 2000.0, 1L, 4.0)))
    assert(rows(("P1", "2025-08"))._2 === 0.0) // no claims
  }

  test("supply chain: per-row OTIF verdicts match the documented expectations") {
    val v = SupplyChain.otif(spark).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getBoolean(r.fieldIndex("otif"))).toMap
    assert(v((100L, 1)) === true)
    assert(v((100L, 2)) === false)  // late
    assert(v((101L, 1)) === false)  // short
    assert(v((101L, 2)) === false)  // never received
    val rates = SupplyChain.otifRate(spark).head
    assert(rates.getDouble(0) === 0.25)
    assert(rates.getDouble(1) === 0.5)  // on-time: rows (100,1),(101,1)
    assert(rates.getDouble(2) === 0.5)  // in-full: (100,1),(100,2)
  }

  test("healthcare: LIKE-cohort existence flags") {
    val rows = Healthcare.memberCohorts(spark).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(rows("M1") === ((1, 1L)))
    assert(rows("M2") === ((0, 0L)))
    assert(rows("M3") === ((1, 2L)))
  }

  test("media AI: LISTAGG tag rollup + deterministic caption classification") {
    val rows = MediaAi.assetProfile(spark).collect()
    val byTitle = rows.map(r => r.getString(1) -> ((r.getString(3), r.getString(4)))).toMap
    // duplicate-title assets keep distinct tag rows (grouped by asset_id)
    assert(rows.length === 4)
    assert(byTitle("Cooking show") === (("food", "cooking recipe")))
    assert(byTitle("News briefing") === (("news", "news report")))
    val goal = rows.filter(_.getString(1) == "Goal compilation")
    assert(goal.map(_.getString(4)).distinct.toSeq === Seq("sports match"))
  }
}
