package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1-shaped smoke over every registered query on sf0.001: runs, nonempty,
  * and (where an oracle exists) its column set matches what the oracle SQL
  * aliases — the driver sorts columns by name before hashing, so a name
  * mismatch is an automatic t2 failure even with identical values.
  */
class QueriesSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val df = q.fn(spark, sfDir)
      assert(df.count() > 0, s"${q.name} returned no rows on sf0.001")
      // same per-query hygiene as Bench/Verify
      graft.Caches.drain(spark)
    }
  }

  test("Caches.drain releases a cache-heavy query's persisted frames") {
    graft.queries.Dashboard.clearCache(spark)
    graft.Caches.drain(spark)
    spark.catalog.clearCache()
    val cm = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager
    // this query persists its tokenization + distinct-set frames
    SparkEntry.queries("x2_jaccard_exact")(spark, sfDir).count()
    assert(!cm.isEmpty, "expected registered persists while the query's caches are live")
    graft.Caches.drain(spark)
    assert(cm.isEmpty, "Caches.drain left cached plans behind")
  }

  test("the end-of-run cache release leaves no cached frames behind") {
    // the queries above persisted Dashboard memo / dedup / IVF frames;
    // Verify and Bench end with exactly this release sequence
    graft.queries.Dashboard.clearCache(spark)
    graft.queries.Llm.clearCache(spark)
    spark.catalog.clearCache()
    val cm = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager
    assert(cm.isEmpty, "cacheManager still holds cached plans after clear")
  }
}
