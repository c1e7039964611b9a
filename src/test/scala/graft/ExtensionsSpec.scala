package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must bind the native functions at session construction:
  * a `newSession()` child has a FRESH function registry (imperative
  * `NativeExpressions.register` temp functions do NOT carry over), so the
  * functions resolving there proves the extensions path, not a leftover
  * registration from another suite.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("injected functions resolve in a brand-new child session via SQL") {
    val fresh = SparkTestSession.spark.newSession()
    val dot = fresh.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .collect().head.getDouble(0)
    assert(dot == 11.0)
    val isect = fresh.sql(
      "SELECT graft_isect(array(1L, 2L, 5L), array(2L, 3L, 5L))")
      .collect().head.getLong(0)
    assert(isect == 2L)
    val maskIsect = fresh.sql(
      """SELECT graft_mask_isect(graft_mask(array(0L, 3L, 70L), 2),
        |                        graft_mask(array(3L, 70L, 100L), 2))""".stripMargin)
      .collect().head.getLong(0)
    assert(maskIsect == 2L)
    val sig = fresh.sql("SELECT size(graft_minhash(array(42L, 7L), 16))")
      .collect().head.getInt(0)
    assert(sig == 16)
    val bigrams = fresh.sql(
      "SELECT graft_bigrams(array('a', 'b', 'a', 'b'))")
      .collect().head.getSeq[String](0)
    assert(bigrams == Seq("a b", "b a"))
    val nShingles = fresh.sql(
      "SELECT size(graft_shingles(array('a', 'b', 'c', 'd'), 3))")
      .collect().head.getInt(0)
    assert(nShingles == 2)
    val bands = fresh.sql(
      "SELECT size(graft_bands(graft_minhash(array(42L, 7L), 16), 8))")
      .collect().head.getInt(0)
    assert(bands == 8)
    val sh = fresh.sql("SELECT graft_simhash(array(5L))")
      .collect().head.getLong(0)
    assert(sh == 5L, "simhash of a single hash is that hash's bits")
    val shs = fresh.sql(
      "SELECT graft_shingle_strings(array('a', 'b', 'a', 'b'), 2)")
      .collect().head.getSeq[String](0)
    assert(shs == Seq("a b", "b a"))
  }
}
