package graft

import graft.operators.AudioCodec
import org.apache.spark.sql.functions._

/** Codec-edge behavior of the REAL WAV path that the arithmetic oracle
  * cannot see: genuine RIFF container bytes, total decode under
  * corruption, and bit-stability across partition layouts.
  */
class AudioCodecSpec extends SparkSpec {

  test("payloads are genuine RIFF/WAVE files") {
    val rows = AudioCodec.payloads(spark, sf).limit(20).collect()
    rows.foreach { r =>
      val b = r.getAs[Array[Byte]]("payload")
      assert(new String(b.slice(0, 4), "US-ASCII") == "RIFF")
      assert(new String(b.slice(8, 12), "US-ASCII") == "WAVE")
      // PCM16 mono: data bytes = 2 × samples, and the container adds a
      // fixed 44-byte canonical header
      val id = r.getAs[Long]("doc_id")
      assert(b.length == 44 + 2 * AudioCodec.clipSamples(id),
        s"clip $id container size")
    }
  }

  test("round trip recovers the synthesized sample stream exactly") {
    val feats = AudioCodec.decodeFeatures(
      AudioCodec.payloads(spark, sf)).collect()
    assert(feats.nonEmpty && feats.forall(_.status == "OK"))
    feats.foreach { f =>
      assert(f.n_samples == AudioCodec.clipSamples(f.doc_id).toLong,
        s"clip ${f.doc_id} sample count")
      // local reference for the L1 energy, independent of Spark
      val expect = (0 until AudioCodec.clipSamples(f.doc_id)).map { i =>
        math.abs(((f.doc_id * 31 + i.toLong * 7) % 65536L - 32768L).toInt)
          .toLong
      }.sum
      assert(f.l1_energy == expect, s"clip ${f.doc_id} L1 energy")
      assert(f.peak <= 32768L)
    }
  }

  test("a corrupt payload degrades to DECODE_ERROR, not a thrown task") {
    val ss = spark
    import ss.implicits._
    val good = AudioCodec.encodeWav(7L)
    val rows = Seq(
      (1L, good),
      (2L, good.slice(0, 10)),              // truncated mid-header
      (3L, Array.fill[Byte](64)(0x5a)),     // not a RIFF container at all
      (4L, Array.emptyByteArray)
    ).toDF("doc_id", "payload")
    val out = AudioCodec.decodeFeatures(rows).collect()
      .map(c => c.doc_id -> c.status).toMap
    assert(out(1L) == "OK")
    assert(out(2L) == "DECODE_ERROR")
    assert(out(3L) == "DECODE_ERROR")
    assert(out(4L) == "DECODE_ERROR")
  }

  test("decode features are bit-stable across partition layouts") {
    def run(parts: Int): Set[(Long, Long, Long)] =
      AudioCodec.decodeFeatures(
        AudioCodec.payloads(spark, sf).repartition(parts))
        .collect().map(c => (c.doc_id, c.l1_energy, c.peak)).toSet
    assert(run(2) == run(7))
  }

  test("mm_real_audio rollup conserves clips and samples") {
    val rep = AudioCodec.realAudioReport(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    assert(rep.map(_.getAs[Long]("n_clips")).sum == n)
    assert(rep.map(_.getAs[Long]("n_ok")).sum == n)
    val expectSamples = Tables.documents(spark, sf)
      .select(col("doc_id")).collect()
      .map(r => AudioCodec.clipSamples(r.getLong(0)).toLong).sum
    assert(rep.map(_.getAs[Long]("total_samples")).sum == expectSamples)
  }
}
