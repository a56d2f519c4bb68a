package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.udaf

/** 64-bit SimHash as a typed [[Aggregator]]: per-token 64-bit hashes vote
  * per bit position (+1 if the bit is set, −1 otherwise); the sign of each
  * tally becomes the output bit. Charikar's similarity-hash construction
  * (public literature; STOC '02).
  *
  * Implemented as an Aggregator rather than an exploded 64×-row pipeline:
  * the buffer is a primitive Int[64], merge is element-wise addition, so
  * Spark runs it as a partial+final aggregate — one shuffle of 64-int
  * buffers per document, no row amplification. That is the shape that
  * survives 100 TB: the buffer size is constant and the aggregation is
  * associative.
  */
object SimHashAgg extends Aggregator[Long, Array[Int], Long] {
  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(b: Array[Int], h: Long): Array[Int] = {
    var i = 0
    while (i < 64) {
      if (((h >>> i) & 1L) == 1L) b(i) += 1 else b(i) -= 1
      i += 1
    }
    b
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Int]): Long = {
    var r = 0L
    var i = 0
    while (i < 64) { if (b(i) > 0) r |= (1L << i); i += 1 }
    r
  }

  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object SimHash {
  /** Column aggregate: simhash over a column of 64-bit token hashes. */
  def simhash(tokenHash: Column): Column =
    udaf(SimHashAgg, Encoders.scalaLong).apply(tokenHash)
}
