package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Binary-column plumbing: payload encoding, partition-wise decode, rollup. */
class MultimodalSpec extends SparkSpec {

  test("payloads carry binary + typed metadata struct") {
    val df = Multimodal.payloads(spark, sf)
    val f = df.schema("payload")
    assert(f.dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    assert(df.count() > 0)
  }

  test("stub decode derives exact checksum from the payload bytes") {
    val row = Multimodal.decodeFeatures(spark, sf)
      .orderBy(col("doc_id").asc).limit(1).collect()(0)
    val doc = Tables.documents(spark, sf)
      .orderBy(col("doc_id").asc).limit(1).collect()(0)
    val bytes = doc.getString(doc.fieldIndex("text")).getBytes("UTF-8")
    assert(row.getLong(row.fieldIndex("byte_len")) == bytes.length.toLong)
    assert(row.getLong(row.fieldIndex("checksum")) ==
      bytes.map(b => (b & 0xff).toLong).sum)
  }

  test("phash dedup finds EVERY hamming<=2 pair (4x4 banding recall proof)") {
    val hs = Multimodal.ahashes(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 2
    } yield (ia, ib)).toSet
    val got = Multimodal.mmPhashDedup(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, "banded candidates must equal brute force at t<=2")
  }

  test("mm_decode_stub rollup is deterministic across runs") {
    val a = Multimodal.mmDecodeStub(spark, sf).collect().map(_.toString).toSeq
    val b = Multimodal.mmDecodeStub(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
