package graft

import org.scalatest.funsuite.AnyFunSuite

/** The byte-denominated broadcast gate's conf resolution — the contract
  * every `bs(frame)` site in the engine now rides on.
  */
class BroadcastsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("default regime compares rows × rowBytes against the site default") {
    assert(Broadcasts.fits(spark, "bs_test", rows = 10, rowBytes = 100,
      defaultBytes = 1001))
    assert(!Broadcasts.fits(spark, "bs_test", rows = 10, rowBytes = 100,
      defaultBytes = 999))
  }

  test("precedence: site byte conf > legacy rows conf > default bytes") {
    spark.conf.set("graft.bs.legacyRows", "9")
    try {
      // legacy conf set: it wins over the default and counts ROWS
      assert(!Broadcasts.fits(spark, "bs_test", rows = 10, rowBytes = 100,
        defaultBytes = Long.MaxValue, legacyRowsConf = "graft.bs.legacyRows"))
      assert(Broadcasts.fits(spark, "bs_test", rows = 9, rowBytes = 100,
        defaultBytes = 1, legacyRowsConf = "graft.bs.legacyRows"))
      // site byte conf set: it wins over the legacy conf and counts BYTES
      spark.conf.set("graft.broadcast.bs_test", "1000")
      assert(Broadcasts.fits(spark, "bs_test", rows = 10, rowBytes = 100,
        defaultBytes = 1, legacyRowsConf = "graft.bs.legacyRows"))
      assert(!Broadcasts.fits(spark, "bs_test", rows = 11, rowBytes = 100,
        defaultBytes = Long.MaxValue, legacyRowsConf = "graft.bs.legacyRows"))
    } finally {
      spark.conf.unset("graft.bs.legacyRows")
      spark.conf.unset("graft.broadcast.bs_test")
    }
  }

  test("rows × rowBytes overflow saturates — the gate CLOSES, never opens") {
    // 2^40 rows × 2^40 bytes overflows Long to a negative product; a naive
    // compare would approve the broadcast. The gate must refuse.
    assert(!Broadcasts.fits(spark, "bs_test_ovf", rows = 1L << 40,
      rowBytes = 1L << 40, defaultBytes = Long.MaxValue))
    spark.conf.set("graft.broadcast.bs_test_ovf", Long.MaxValue.toString)
    try assert(!Broadcasts.fits(spark, "bs_test_ovf", rows = 1L << 40,
      rowBytes = 1L << 40, defaultBytes = 0))
    finally spark.conf.unset("graft.broadcast.bs_test_ovf")
  }

  test("over-gate frames carry NO forced-strategy hint — the planner/AQE " +
      "keeps the choice") {
    val a = spark.range(0, 1000).toDF("k")
    val b = spark.range(0, 100).toDF("k")
    spark.conf.set("graft.broadcast.bs_tier", "0") // never broadcast
    try {
      // an r13 sf3 ablation measured a SHUFFLE_HASH middle tier at 5x the
      // un-hinted warm steady state on the jaccard verify join — the
      // identity branch is a measured decision, pinned here: no hint node
      // may appear in the over-gate plan
      val g = Broadcasts.gate(spark, "bs_tier", rows = 100, rowBytes = 8,
        defaultBytes = 0)
      val gated = g(b)
      assert(gated eq b, "over-gate branch must be identity (no hint wrapper)")
      val p = a.join(gated, "k").queryExecution.analyzed.toString
      assert(!p.contains("hint"), s"no hint may survive the gate; plan=\n$p")
    } finally {
      spark.conf.unset("graft.broadcast.bs_tier")
    }
  }

  test("graft.broadcast.default flips every site without its own conf") {
    spark.conf.set("graft.broadcast.default", "0")
    try {
      assert(!Broadcasts.fits(spark, "bs_test2", rows = 1, rowBytes = 1,
        defaultBytes = Long.MaxValue))
      // a site conf still overrides the fleet default
      spark.conf.set("graft.broadcast.bs_test2", "10")
      assert(Broadcasts.fits(spark, "bs_test2", rows = 1, rowBytes = 1,
        defaultBytes = 0))
    } finally {
      spark.conf.unset("graft.broadcast.default")
      spark.conf.unset("graft.broadcast.bs_test2")
    }
  }
}
