package graft.sources

import java.nio.file.Files
import graft.SparkTestBase

class VecFilesSpec extends SparkTestBase {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft-vecs").resolve(name).toString

  test("fvecs roundtrip preserves values and order") {
    val path = tmp("a.fvecs")
    val vecs = (0 until 25).map(i => Array(i.toFloat, i + 0.25f, -i.toFloat))
    VecFiles.writeFvecs(path, vecs)
    val df = VecFiles.readFvecs(spark, path)
    val rows = df.orderBy("id").collect()
    assert(rows.length === 25)
    assert(rows(3).getLong(0) === 3L)
    assert(rows(3).getSeq[Float](1) === Seq(3f, 3.25f, -3f))
  }

  test("ivecs and bvecs parse their element types") {
    val ip = tmp("b.ivecs")
    VecFiles.writeIvecs(ip, Seq(Array(7, -1, 42), Array(0, 1, 2)))
    val idf = VecFiles.readIvecs(spark, ip).orderBy("id").collect()
    assert(idf(0).getSeq[Int](1) === Seq(7, -1, 42))

    val bp = tmp("c.bvecs")
    VecFiles.writeBvecs(bp, Seq(Array[Short](0, 128, 255)))
    val bdf = VecFiles.readBvecs(spark, bp).collect()
    assert(bdf(0).getSeq[Short](1) === Seq[Short](0, 128, 255))
  }

  test("corrupt (misaligned) file raises a clear error") {
    val path = tmp("d.fvecs")
    // second record lies about its dim
    val bb = java.nio.ByteBuffer.allocate(2 * (4 + 8))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(2).putFloat(1f).putFloat(2f)
    bb.putInt(3).putFloat(1f).putFloat(2f)
    Files.write(java.nio.file.Paths.get(path), bb.array())
    val ex = intercept[org.apache.spark.SparkException] {
      VecFiles.readFvecs(spark, path).collect()
    }
    assert(ex.getMessage.contains("misaligned") ||
      ex.getCause.getMessage.contains("misaligned"))
  }
}
