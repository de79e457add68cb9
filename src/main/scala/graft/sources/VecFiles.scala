package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Readers for the SIFT-style ANN benchmark formats `.fvecs` /
  * `.ivecs` / `.bvecs` — `parse_fvecs/ivecs/bvecs` in the reference
  * (lantern_extras/src/dotvecs.rs:32-150). Record layout: u32 LE
  * dimension, then dim elements (f32 / i32 / u8). The dimension is
  * constant per file, so records are fixed-length: the driver reads the
  * first header, then `binaryRecords` splits the file by record across
  * tasks — fully parallel ingestion, no single-reader bottleneck.
  *
  * `id` is the 0-based record ordinal (zipWithIndex: one extra count
  * job, O(partitions) driver work — acceptable for ingestion).
  */
object VecFiles {

  private def readDim(spark: SparkSession, path: String): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val b = new Array[Byte](4)
      in.readFully(0L, b)
      val dim = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
      require(dim > 0 && dim <= (1 << 20), s"graft: implausible vec dim $dim in $path")
      dim
    } finally in.close()
  }

  private def read(
      spark: SparkSession,
      path: String,
      elemSize: Int,
      elemType: DataType)(parse: (ByteBuffer, Int) => AnyRef): DataFrame = {
    val dim = readDim(spark, path)
    val recordLen = 4 + dim * elemSize
    val rows = spark.sparkContext
      .binaryRecords(path, recordLen)
      .zipWithIndex()
      .map { case (bytes, idx) =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val d = bb.getInt
        require(d == dim,
          s"graft: corrupt record $idx: dim $d != $dim (misaligned file?)")
        Row(idx, parse(bb, dim))
      }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(elemType, containsNull = false)))))
  }

  /** `.fvecs`: float32 vectors → (id, vec array<float>). */
  def readFvecs(spark: SparkSession, path: String): DataFrame =
    read(spark, path, 4, FloatType) { (bb, dim) =>
      val v = new Array[Float](dim)
      var i = 0
      while (i < dim) { v(i) = bb.getFloat; i += 1 }
      v.toSeq
    }

  /** `.ivecs`: int32 vectors (ground-truth neighbor ids) → array<int>. */
  def readIvecs(spark: SparkSession, path: String): DataFrame =
    read(spark, path, 4, IntegerType) { (bb, dim) =>
      val v = new Array[Int](dim)
      var i = 0
      while (i < dim) { v(i) = bb.getInt; i += 1 }
      v.toSeq
    }

  /** `.bvecs`: uint8 vectors → array<short> (0..255 preserved). */
  def readBvecs(spark: SparkSession, path: String): DataFrame =
    read(spark, path, 1, ShortType) { (bb, dim) =>
      val v = new Array[Short](dim)
      var i = 0
      while (i < dim) { v(i) = (bb.get() & 0xFF).toShort; i += 1 }
      v.toSeq
    }

  // ------------------------------------------------------------ writers
  // (test-fixture + export convenience; driver-side, small files)

  def writeFvecs(path: String, vecs: Seq[Array[Float]]): Unit =
    writeRecords(path, vecs.map { v =>
      val bb = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(v.length); v.foreach(bb.putFloat); bb.array()
    })

  def writeIvecs(path: String, vecs: Seq[Array[Int]]): Unit =
    writeRecords(path, vecs.map { v =>
      val bb = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(v.length); v.foreach(bb.putInt); bb.array()
    })

  def writeBvecs(path: String, vecs: Seq[Array[Short]]): Unit =
    writeRecords(path, vecs.map { v =>
      val bb = ByteBuffer.allocate(4 + v.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(v.length); v.foreach(x => bb.put((x & 0xFF).toByte)); bb.array()
    })

  private def writeRecords(path: String, records: Seq[Array[Byte]]): Unit = {
    val out = new java.io.FileOutputStream(path)
    try records.foreach(out.write) finally out.close()
  }
}
