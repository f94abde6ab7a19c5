package graft

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{StatefulOps, TwsOps}
import graft.streaming.StatefulOps.{KSV, KV}

/** transformWithState: behavioral parity with the flatMapGroupsWithState
  * twins on synthetic fixtures, plus the LITERAL state-shape witness — the
  * engine's own checkpoint metadata must record the Flink shapes
  * (ValueState / MapState / ListState) each processor declares. */
class TwsSpec extends SparkSpec {

  import spark.implicits._

  private implicit val kvEnc: Encoder[KV] = Encoders.product[KV]
  private implicit val ksvEnc: Encoder[KSV] = Encoders.product[KSV]

  /** Drain `op` over a one-file replay of `input` with an explicit
    * checkpoint (RocksDB provider — required by TWS), returning the sink
    * rows and the operator metadata JSON the engine wrote. */
  private def drainWithMetadata[I](input: Dataset[I], op: Dataset[I] => DataFrame)
                                  (implicit enc: Encoder[I]): (Seq[String], String) = {
    val src = java.nio.file.Files.createTempDirectory("tws-spec-src-")
    val ckpt = java.nio.file.Files.createTempDirectory("tws-spec-ckpt-")
    val qn = s"tws_spec_${System.nanoTime()}"
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      input.toDF().coalesce(1).write.mode("overwrite").parquet(src.toString)
      val stream = spark.readStream.schema(input.toDF().schema)
        .parquet(src.toString).as[I]
      val q = op(stream).writeStream.outputMode("append").format("memory")
        .option("checkpointLocation", ckpt.toString)
        .queryName(qn).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rows = spark.table(qn).collect().map(_.toString).sorted.toSeq
      // resolve the operator-metadata file by GLOB, not a pinned version
      // path: a Spark upgrade that bumps the metadata layout (v2 → v3)
      // must fail as a parity mismatch with a useful listing, not a bare
      // file-not-found on a hardcoded path
      val metaRoot = ckpt.resolve("state/0/_metadata")
      def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
        val s = java.nio.file.Files.list(p)
        try { import scala.jdk.CollectionConverters._; s.iterator().asScala.toSeq }
        finally s.close()
      }
      require(java.nio.file.Files.isDirectory(metaRoot),
        s"no operator metadata dir at $metaRoot")
      val versionDir = listDir(metaRoot).filter(java.nio.file.Files.isDirectory(_))
        .sortBy(_.getFileName.toString).lastOption
        .getOrElse(sys.error(s"no version dir under $metaRoot: " +
          listDir(metaRoot).mkString(", ")))
      val metaPath = listDir(versionDir)
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          !p.getFileName.toString.startsWith(".")) // skip .crc shadows
        .sortBy(_.getFileName.toString).headOption
        .getOrElse(sys.error(s"no metadata file under $versionDir: " +
          listDir(versionDir).mkString(", ")))
      val meta = new String(java.nio.file.Files.readAllBytes(metaPath),
        java.nio.charset.StandardCharsets.UTF_8)
      (rows, meta)
    } finally {
      if (spark.catalog.tableExists(qn)) spark.catalog.dropTempView(qn)
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  // the metadata nests the operator properties as an ESCAPED json string,
  // so the raw file carries literal \" around each field
  private def stateVar(meta: String, name: String, tpe: String): Boolean =
    meta.contains("\\\"stateName\\\":\\\"" + name +
      "\\\",\\\"stateVariableType\\\":\\\"" + tpe + "\\\"")

  private val kvFixture = Seq(
    KV("a", 1L, 1.0), KV("a", 2L, 5.0), KV("a", 3L, 2.0), KV("a", 4L, 7.0),
    KV("b", 1L, 9.0), KV("b", 2L, 3.0), KV("b", 3L, 11.0))

  test("tws running max: matches the fMGWS twin and registers a literal ValueState") {
    val (rows, meta) = drainWithMetadata[KV](kvFixture.toDS(), ds =>
      TwsOps.runningMaxTws(ds).toDF())
    val twin = StatefulOps.runningMax(kvFixture.toDS()).toDF()
      .collect().map(_.toString).sorted.toSeq
    assert(rows === twin)
    assert(stateVar(meta, TwsOps.Q1StateVar, "ValueState"), meta)
  }

  test("tws block average: matches the fMGWS twin and registers the counter+sum ValueStates") {
    // blocks of 3: 2 summed records + 1 trigger (emits sum/2, discarded)
    val data = (1L to 8L).map(i => KV("k", i, i.toDouble))
    val (rows, meta) = drainWithMetadata[KV](data.toDS(), ds =>
      TwsOps.blockAverageTws(ds, emitCount = 2).toDF())
    val twin = StatefulOps.blockAverage(data.toDS(), blockSize = 3, emitCount = 2).toDF()
      .collect().map(_.toString).sorted.toSeq
    assert(rows === twin)
    for (v <- Seq(TwsOps.Q2CountVar, TwsOps.Q2SumVar, TwsOps.Q2FiniteVar, TwsOps.Q2BlockVar))
      assert(stateVar(meta, v, "ValueState"), s"$v missing in $meta")
  }

  test("tws subkey max: matches the fMGWS twin and registers a literal MapState") {
    val data = Seq(
      KSV("y1", "m1", 1L, 4.0), KSV("y1", "m2", 2L, 9.0), KSV("y1", "m1", 3L, 2.0),
      KSV("y1", "m2", 4L, 1.0), KSV("y2", "m1", 1L, 5.0))
    val (rows, meta) = drainWithMetadata[KSV](data.toDS(), ds =>
      TwsOps.runningMaxBySubkeyTws(ds).toDF())
    val twin = StatefulOps.runningMaxBySubkey(data.toDS()).toDF()
      .collect().map(_.toString).sorted.toSeq
    assert(rows === twin)
    assert(stateVar(meta, TwsOps.Q3StateVar, "MapState"), meta)
  }

  test("tws threshold gaps: matches the fMGWS twin and registers a literal ListState") {
    val data = Seq(
      KV("k", 1L, 1.0), KV("k", 2L, 2.0), KV("k", 3L, 100.0), KV("k", 4L, 3.0),
      KV("k", 5L, 200.0), KV("k", 6L, 150.0), KV("z", 1L, 100.0))
    val (rows, meta) = drainWithMetadata[KV](data.toDS(), ds =>
      TwsOps.thresholdGapsTws(ds, 100.0).toDF())
    val twin = StatefulOps.thresholdGaps(data.toDS(), 100.0).toDF()
      .collect().map(_.toString).sorted.toSeq
    assert(rows === twin)
    assert(stateVar(meta, TwsOps.Q4StateVar, "ListState"), meta)
  }
}
