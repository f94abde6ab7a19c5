package graft

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.KV

/** Generative equivalence: the Spark stateful operators vs a trivial
  * in-memory simulation of the reference's per-record semantics, on random
  * keyed streams (SURVEY.md §5.3). Seeded for reproducibility. */
class StatefulPropsSpec extends SparkSpec {

  import spark.implicits._

  private def randomStream(seed: Long, n: Int): List[KV] = {
    val rnd = new scala.util.Random(seed)
    val keys = Array("a", "b", "c")
    List.tabulate(n) { i =>
      KV(keys(rnd.nextInt(keys.length)), i.toLong,
         math.rint(rnd.nextDouble() * 40000) / 100) // 2-decimal values
    }
  }

  // stream sizes hit the block-cycle edges (50/51/102/...) per key on average
  private val trials = Seq(1L -> 40, 2L -> 153, 3L -> 200, 4L -> 310, 5L -> 512)

  test("property: runningMax equals per-key prefix maximum on random streams") {
    for ((seed, n) <- trials) {
      val kv = randomStream(seed, n)
      val got = StatefulOps.runningMax(spark.createDataset(kv))
        .collect().map(o => o.ord -> o.out).toMap
      val maxes = scala.collection.mutable.Map.empty[String, Double]
      kv.foreach { r =>
        val m = math.max(maxes.getOrElse(r.key, Double.NegativeInfinity), r.value)
        maxes(r.key) = m
        assert(got(r.ord) === m, s"seed=$seed ord=${r.ord}")
      }
      assert(got.size === kv.size)
    }
  }

  test("property: blockAverage emits floor(n_k/51) per key, trigger rows excluded") {
    for ((seed, n) <- trials) {
      val kv = randomStream(seed, n)
      val got = StatefulOps.blockAverage(spark.createDataset(kv))
        .collect().groupBy(_.key).view.mapValues(_.sortBy(_.ord).map(_.out).toList).toMap
      kv.groupBy(_.key).foreach { case (k, rs) =>
        val sorted = rs.sortBy(_.ord)
        assert(got.getOrElse(k, Nil).size === sorted.size / 51, s"seed=$seed key=$k")
        val expected = sorted.grouped(51).filter(_.size == 51).map { block =>
          val cents = block.take(50).map(r => math.rint(r.value * 100).toLong).sum
          Some((cents.toDouble / 100.0) / 50)
        }.toList
        assert(got.getOrElse(k, Nil) === expected, s"seed=$seed key=$k")
      }
    }
  }

  test("property: thresholdGaps matches simulation and conserves row counts") {
    for ((seed, n) <- trials) {
      val kv = randomStream(seed, n)
      val thr = 200.0
      val got = StatefulOps.thresholdGaps(spark.createDataset(kv), thr)
        .collect().groupBy(_.key).view.mapValues(_.sortBy(_.ord).map(_.gap).toList).toMap
      kv.groupBy(_.key).foreach { case (k, rs) =>
        val sorted = rs.sortBy(_.ord)
        var acc = 0L
        val sim = scala.collection.mutable.ListBuffer.empty[Long]
        sorted.foreach { r => if (r.value >= thr) { sim += acc; acc = 0 } else acc += 1 }
        assert(got.getOrElse(k, Nil) === sim.toList, s"seed=$seed key=$k")
        val breaches = sorted.count(_.value >= thr)
        assert(sim.sum + breaches + acc === sorted.size, s"seed=$seed key=$k")
      }
    }
  }
}
