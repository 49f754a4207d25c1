package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parity codec for the reference's fvecs-family binary formats
  * (`/root/reference/src/utils.rs:280-364`): record = u32 LE dim header +
  * dim fixed-width LE values. Parquet is this engine's primary format;
  * fvecs exists so reference-produced artifacts can be ingested and
  * reference-shaped artifacts exported.
  *
  * Read path uses the binaryFile source — one task per file (the format
  * has no record index, so a single file is not splittable; shard across
  * files for parallelism). vec_id = position within the file.
  */
object Fvecs {

  private def decode[T: scala.reflect.ClassTag](bytes: Array[Byte], width: Int,
                        get: ByteBuffer => T): Iterator[(Long, Seq[T])] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    new Iterator[(Long, Seq[T])] {
      private var idx = 0L
      override def hasNext: Boolean = buf.remaining() >= 4
      override def next(): (Long, Seq[T]) = {
        val dim = buf.getInt()
        require(dim >= 0 && buf.remaining() >= dim * width,
          s"corrupt vecs record at index $idx: dim=$dim remaining=${buf.remaining()}")
        val out = new Array[T](dim)
        var i = 0
        while (i < dim) { out(i) = get(buf); i += 1 }
        val r = (idx, out.toSeq)
        idx += 1
        r
      }
    }
  }

  /** fvecs → (vec_id: long, vec: array<float>). */
  def readFvecs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap(bytes => decode[Float](bytes, 4, _.getFloat()))
      .toDF("vec_id", "vec")
  }

  /** ivecs → (vec_id: long, vec: array<int>). */
  def readIvecs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap(bytes => decode[Int](bytes, 4, _.getInt()))
      .toDF("vec_id", "vec")
  }

  /** u64vecs → (vec_id: long, vec: array<long>). Record header counts
    * 8-byte values (`/root/reference/src/utils.rs:309-330`).
    */
  def readU64vecs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap(bytes => decode[Long](bytes, 8, _.getLong()))
      .toDF("vec_id", "vec")
  }

  private def writeRecords(path: String, rows: Iterator[scala.collection.Seq[_]], width: Int,
                           put: (ByteBuffer, Any) => Unit): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      rows.foreach { vec =>
        val buf = ByteBuffer.allocate(4 + vec.length * width).order(ByteOrder.LITTLE_ENDIAN)
        buf.putInt(vec.length)
        vec.foreach(v => put(buf, v))
        out.write(buf.array())
      }
    } finally out.close()
  }

  /** Write (vec_id, vec: array<float>) as one fvecs file, ordered by
    * vec_id. Driver-side sequential write — a parity/export codec for
    * model-sized artifacts, not a data-scale sink (that's parquet).
    */
  def writeFvecs(df: DataFrame, path: String): Unit =
    writeRecords(path,
      df.orderBy("vec_id").select("vec").toLocalIterator().asScala
        .map(_.getSeq[Float](0)),
      4, (b, v) => b.putFloat(v.asInstanceOf[Float]))

  def writeIvecs(df: DataFrame, path: String): Unit =
    writeRecords(path,
      df.orderBy("vec_id").select("vec").toLocalIterator().asScala
        .map(_.getSeq[Int](0)),
      4, (b, v) => b.putInt(v.asInstanceOf[Int]))

  def writeU64vecs(df: DataFrame, path: String): Unit =
    writeRecords(path,
      df.orderBy("vec_id").select("vec").toLocalIterator().asScala
        .map(_.getSeq[Long](0)),
      8, (b, v) => b.putLong(v.asInstanceOf[Long]))

  private implicit class IterConv[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      override def hasNext: Boolean = it.hasNext
      override def next(): T = it.next()
    }
  }
}
