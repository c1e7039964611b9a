package graft

import graft.gen.Generator
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the generator invariants transcribed from the
  * reference (FIXTURES.md §A1; iot-data-stream.py:54-98,161-173,185-193,
  * 234-236,254).
  */
class GeneratorSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val sample = Generator
    .readings(spark, nDevices = 30, ticks = 100).collect().toSeq
  private lazy val byDevice = sample.groupBy(_.device_id)

  test("every reading value is within its sensor's [min,max] and rounded to precision") {
    val cfg = sensorConfigs.map(c => c.name -> c).toMap
    sample.foreach { r =>
      r.readings.foreach { case (name, sv) =>
        val c = cfg(name)
        assert(sv.value >= c.min && sv.value <= c.max, s"$name=${sv.value}")
        val m = math.pow(10, c.precision.toDouble)
        assert(math.abs(sv.value * m - math.round(sv.value * m)) < 1e-6,
          s"$name=${sv.value} not rounded to ${c.precision}")
        assert(sv.unit == c.unit)
      }
    }
  }

  test("each device carries 4 to 6 sensor types, constant over its lifetime") {
    byDevice.foreach { case (id, rs) =>
      val sets = rs.map(_.readings.keySet).distinct
      assert(sets.size == 1, s"$id sensor set changed")
      assert(sets.head.size >= 4 && sets.head.size <= 6)
    }
  }

  test("battery only decays except for anomaly pins to min/max") {
    byDevice.foreach { case (_, rs) =>
      val bat = rs.sortBy(_.timestamp.getTime)
        .flatMap(_.readings.get("battery_level").map(_.value))
      bat.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b <= a || b == 100.0 || b == 0.0,
            s"battery rose $a -> $b without anomaly pin")
        case _ =>
      }
    }
  }

  test("non-anomalous drift is bounded by the sensor's drift factor") {
    val cfg = sensorConfigs.map(c => c.name -> c).toMap
    byDevice.foreach { case (_, rs) =>
      rs.sortBy(_.timestamp.getTime).sliding(2).foreach {
        case Seq(a, b) =>
          b.readings.foreach { case (name, sv) =>
            val c = cfg(name)
            a.readings.get(name).foreach { prev =>
              val delta = math.abs(sv.value - prev.value)
              val anomalyPin = sv.value == c.max || sv.value == c.min
              // rounding can add up to half an ulp of the precision step
              val tol = c.driftFactor + math.pow(10, -c.precision.toDouble) / 2 + 1e-9
              assert(delta <= tol || anomalyPin,
                s"$name jumped $delta > ${c.driftFactor} without pin")
            }
          }
        case _ =>
      }
    }
  }

  test("reporting probability ~98%: devices skip some ticks but most report") {
    val counts = byDevice.values.map(_.size)
    val rate = counts.sum.toDouble / (30 * 100)
    assert(rate > 0.95 && rate <= 1.0, s"report rate $rate")
    assert(counts.exists(_ < 100), "expected at least one skipped tick across 30 devices")
  }

  test("status distribution is overwhelmingly operational with rare errors") {
    val byStatus = sample.groupBy(_.status).view.mapValues(_.size).toMap
    val n = sample.size.toDouble
    assert(byStatus.getOrElse("operational", 0) / n > 0.90)
    assert(byStatus.getOrElse("error", 0) / n < 0.03)
    assert(byStatus.keySet.subsetOf(statuses.map(_._1).toSet))
  }

  test("generation is deterministic and partition-count independent") {
    val a = Generator.readings(spark, 10, 20).collect().map(_.toString).sorted
    val b = Generator.readings(spark, 10, 20).repartition(3).collect()
      .map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("flatten produces the wide schema with nulls for absent sensors") {
    val flat = Generator.flatten(Generator.readings(spark, 10, 5))
    val cols = flat.columns.toSet
    sensorConfigs.foreach { c =>
      assert(cols.contains(s"${c.name}_value") && cols.contains(s"${c.name}_unit"))
    }
    // some device lacks some sensor -> at least one null in some _value column
    val anyNull = sensorConfigs.exists { c =>
      flat.filter(flat(s"${c.name}_value").isNull).limit(1).count() > 0
    }
    assert(anyNull, "expected at least one absent sensor across 10 devices")
    // flatten preserves row count
    assert(flat.count() == Generator.readings(spark, 10, 5).count())
  }
}
