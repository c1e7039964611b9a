package graft.gen

import org.scalacheck.{Gen, Prop, Properties}
import scala.util.Random

/** ScalaCheck properties for the generator's pure kernels (SURVEY.md §5.3):
  * sbt runs Properties suites natively alongside ScalaTest.
  */
object GeneratorProps extends Properties("Generator") {

  property("roundTo is idempotent and precision-bounded") =
    Prop.forAll(Gen.chooseNum(-1e6, 1e6), Gen.choose(0, 3)) { (v: Double, p: Int) =>
      val r = Generator.roundTo(v, p)
      val m = math.pow(10, p.toDouble)
      Generator.roundTo(r, p) == r && math.abs(r * m - math.round(r * m)) < 1e-6
    }

  property("weightedChoice returns only weighted values, never throws") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue)) { seed: Long =>
      val rng = new Random(seed)
      val w = Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
      val v = Generator.weightedChoice(rng, w)
      w.exists(_._1 == v)
    }

  property("weightedChoice distribution tracks the weights") =
    Prop.forAll(Gen.choose(0L, 1000L)) { seed: Long =>
      val rng = new Random(seed)
      val w = Seq("hot" -> 0.9, "cold" -> 0.1)
      val n = 500
      val hot = (1 to n).count(_ => Generator.weightedChoice(rng, w) == "hot")
      hot > n / 2 // 0.9 weight must dominate any 500-draw sample
    }

  property("deviceTimeline is deterministic for a fixed (seed, device)") =
    Prop.forAll(Gen.choose(0L, 100L), Gen.choose(1, 20)) { (dev: Long, ticks: Int) =>
      val a = Generator.deviceTimeline(dev, ticks, 42L, 0L, 1000L).toList
      val b = Generator.deviceTimeline(dev, ticks, 42L, 0L, 1000L).toList
      a == b
    }

  property("readings stay within sensor bounds at any tick count") =
    Prop.forAll(Gen.choose(0L, 50L), Gen.choose(1, 30)) { (dev: Long, ticks: Int) =>
      val cfg = graft.model.sensorConfigs.map(c => c.name -> c).toMap
      Generator.deviceTimeline(dev, ticks, 7L, 0L, 1000L).forall { r =>
        r.readings.forall { case (name, sv) =>
          val c = cfg(name); sv.value >= c.min && sv.value <= c.max
        }
      }
    }
}
