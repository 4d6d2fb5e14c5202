package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Media, MediaMeta}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, "abcdefghij" * 10)).toDF("id", "text")

  test("payload + metadata: binary column with byte-accurate sizes") {
    val d = Multimodal.withMeta(Multimodal.withPayload(docs, "text"))
    val rows = d.orderBy("id").collect()
    assert(d.schema("payload").dataType.typeName == "binary")
    assert(rows.map(_.getAs[org.apache.spark.sql.Row]("meta").getAs[Long]("n_bytes")).toSeq
      == Seq(11L, 100L))
  }

  test("fakeFeature is deterministic and scales to [0,1)") {
    val f = docs.select(
      Multimodal.featureValue(Multimodal.fakeFeature(col("text"), 0)).as("f0"))
      .collect().map(_.getDouble(0)).toSeq
    assert(f.forall(v => v >= 0.0 && v < 1.0))
    val f2 = docs.repartition(3).select(
      Multimodal.featureValue(Multimodal.fakeFeature(col("text"), 0)).as("f0"))
      .collect().map(_.getDouble(0)).toSeq
    assert(f.sorted == f2.sorted)
  }

  test("thumbnail truncates payload bytes; frames chunk it completely") {
    val d = Multimodal.withPayload(docs, "text")
    val t = d.select(octet_length(Multimodal.thumbnail(col("payload"), 8))).collect()
      .map(_.getInt(0)).toSeq
    assert(t == Seq(8, 8))
    val fr = d.filter(col("id") === 2)
      .select(Multimodal.frames(col("payload"), frameBytes = 30).as("fs"))
      .select(size(col("fs")), col("fs").getItem(0))
      .first()
    assert(fr.getInt(0) == 4) // 100 bytes -> 30+30+30+10
    assert(fr.getAs[Array[Byte]](1).length == 30)
    // stride: keep every 2nd frame (indices 0 and 2)
    val strided = d.filter(col("id") === 2)
      .select(Multimodal.frames(col("payload"), frameBytes = 30, stride = 2).as("fs"))
      .select(size(col("fs"))).first().getInt(0)
    assert(strided == 2)
  }

  test("decodeAll runs partition-parallel with deterministic fake decode") {
    val media = docs.as[(Long, String)].map { case (id, t) =>
      Media(id, t.getBytes("UTF-8"), MediaMeta("text/plain", t.length.toLong, 0, 0))
    }
    val out1 = Multimodal.decodeAll(media).orderBy("mediaId").collect().toSeq
    val out2 = Multimodal.decodeAll(media.repartition(4)).orderBy("mediaId").collect().toSeq
    assert(out1 == out2)
    assert(out1.map(_.channels).forall(_ == 3))
    assert(out1.head.checksum.length == 32)
  }
}
