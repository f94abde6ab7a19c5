package graft

import graft.operators.Multimodal

/** The round-13 multimodal stages against the synthesis closed forms:
  * strided frame sampling and rational-ratio audio resampling. */
class MultimodalSpec extends SparkSpec {

  test("strided frame sampling keeps exactly the even original indices") {
    val strided = Multimodal.videoFramesStrided(spark, Sf0001).collect()
    val all = Multimodal.videoFrames(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(strided.nonEmpty)
    strided.foreach { r =>
      val (id, idx, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(idx % 2 === 0, "stride-2 must keep only even frame indices")
      // the hash is the FULL sampler's hash at the same original index:
      // sampling changed which frames survive, never their decode
      assert(all((id, idx)) === h)
    }
    // per video: ceil(nf/2) frames survive
    val perVid = strided.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    val allPer = all.keys.groupBy(_._1).view.mapValues(_.size).toMap
    perVid.foreach { case (id, k) => assert(k === (allPer(id) + 1) / 2) }
  }

  test("audio energy frames: exact moments match the synthesis formula; tail dropped") {
    val rows = Multimodal.audioEnergyWindows(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val perMedia = rows.groupBy(_.media_id)
    for ((id, ws) <- perMedia) {
      val n = Multimodal.audioSamples(id)
      assert(ws.length === n / 32, "one frame per full 32-sample window, tail dropped")
      assert(ws.map(_.win_idx).sorted.toSeq === (0L until n / 32).toSeq)
      for (w <- ws) {
        val vs = (0 until 32).map(j => Multimodal.byteAt(id, 0, w.win_idx.toInt * 32 + j).toLong)
        assert(w.sum_v === vs.sum)
        assert(w.energy === vs.map(v => v * v).sum)
        assert(w.peak === vs.max)
        // Cauchy–Schwarz sanity on the integer moments
        assert(w.sum_v * w.sum_v <= 32L * w.energy)
      }
    }
  }

  test("audio resample maps the rational index grid exactly") {
    val rows = Multimodal.audioResampled(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === 8000L && r.getLong(2) === 6000L)
      val n = Multimodal.audioSamples(id)
      assert(r.getLong(3) === n.toLong)
      val nOut = n.toLong * 6000 / 8000
      assert(r.getLong(4) === nOut)
      // recompute the hash from the synthesis formula over in[(4j)/3]
      var acc = 0L
      for (j <- 0L until nOut)
        acc = (acc * 31L + Multimodal.byteAt(id, 0, (j * 4 / 3).toInt)) %
          graft.functions.TextFunctions.HashMod
      assert(r.getLong(5) === acc)
    }
  }
}
