package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's t2 gate hashes results row-by-row, so every registered query
  * must be bit-deterministic — including under a DIFFERENT partitioning than
  * the one it was developed with (float summation order, rand(), and
  * collect_list order are all partition-sensitive failure modes). Each query
  * runs twice on sf0.001 with shuffle.partitions 8 vs 3; results must match
  * exactly, row order included.
  */
class DeterminismSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  private def runAll(parts: Int): Map[String, Seq[String]] = {
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sfDir).collect().toSeq.map(_.toString)
    }
    finally spark.conf.set("spark.sql.shuffle.partitions", 8)
  }

  test("registry names are unique (Map would silently drop a duplicate)") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.length == names.length,
      s"duplicates: ${names.diff(names.distinct).distinct}")
  }

  test("every query is bit-identical under 8 vs 3 shuffle partitions") {
    val a = runAll(8)
    val b = runAll(3)
    val bad = a.keys.toSeq.sorted.flatMap { name =>
      if (a(name) == b(name)) None
      else {
        val diff = a(name).zip(b(name)).indexWhere { case (x, y) => x != y }
        Some(s"$name: rows ${a(name).size}/${b(name).size}, first diff at $diff")
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
