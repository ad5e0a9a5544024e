package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Top-k by score as a `TypedImperativeAggregate` with a bounded min-heap
  * buffer (SURVEY.md §2.13/§4.3's "optional later: top-k heap aggregator
  * to replace global sort-limit at extreme scale").
  *
  * Why it matters at 100 TB: `ORDER BY score DESC LIMIT k` plans as
  * `TakeOrderedAndProject`, which still materializes and partially sorts
  * every partition's rows; as a partial-aggregable function each task
  * carries at most k (score, payload) pairs to the driver/shuffle —
  * O(k) state instead of O(rows) sort input, and it composes under
  * `GROUP BY` for per-group top-k without a window sort.
  *
  * eval returns `array<struct<score:double, payload:string>>` sorted by
  * score descending (ties: payload ascending — deterministic).
  */
case class TopKByScore(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, String)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("payload", StringType, nullable = true))))

  /** Quality order: compare(x, y) < 0 ⇔ x is WORSE than y. Better =
    * higher score; on ties, lexicographically smaller payload (null
    * payload is worst). */
  private object Quality extends Ordering[(Double, String)] {
    def compare(x: (Double, String), y: (Double, String)): Int = {
      val c = java.lang.Double.compare(x._1, y._1)
      if (c != 0) c
      else (x._2, y._2) match {
        case (null, null) => 0
        case (null, _) => -1 // null payload is worse
        case (_, null) => 1
        case (a, b) => -a.compareTo(b) // smaller payload is better
      }
    }
  }

  // heap dequeues the max of its ordering; order by REVERSED quality so
  // the max (= head) is the WORST kept element, evicted first
  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, String)] =
    mutable.PriorityQueue.empty[(Double, String)](Quality.reverse)

  private def offer(buf: mutable.PriorityQueue[(Double, String)],
      s: Double, p: String): Unit = {
    if (buf.size < k) buf.enqueue((s, p))
    else if (Quality.lt(buf.head, (s, p))) { // head == current worst
      buf.dequeue(); buf.enqueue((s, p))
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, String)],
      input: InternalRow): mutable.PriorityQueue[(Double, String)] = {
    val s = score.eval(input)
    if (s != null) {
      val p = payload.eval(input)
      offer(buf, s.asInstanceOf[Double],
        if (p == null) null else p.toString)
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, String)],
      other: mutable.PriorityQueue[(Double, String)]): mutable.PriorityQueue[(Double, String)] = {
    other.foreach { case (s, p) => offer(buf, s, p) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, String)]): Any = {
    val sorted = buf.toVector.sorted(Quality.reverse) // best first
    new GenericArrayData(sorted.map { case (s, p) =>
      InternalRow(s, if (p == null) null else UTF8String.fromString(p))
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, p) =>
      out.writeDouble(s)
      out.writeBoolean(p != null)
      if (p != null) {
        // length-prefixed raw UTF-8, NOT writeUTF: writeUTF throws
        // UTFDataFormatException beyond 65535 encoded bytes, which would
        // crash partial aggregation on long payloads (e.g. chunk texts)
        val b = p.getBytes(StandardCharsets.UTF_8)
        out.writeInt(b.length)
        out.write(b)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val s = in.readDouble()
      val p = if (in.readBoolean()) {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        new String(b, StandardCharsets.UTF_8)
      } else null
      buf.enqueue((s, p))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), payload = newChildren(1))
  override def prettyName: String = "topk_by_score"
}

object TopKByScore {
  /** Column API: `topk_by_score(score, payload, k)` → sorted
    * array<struct<score,payload>> (best first). */
  def topk_by_score(score: Column, payload: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(score), Bridge.expression(payload), k)
        .toAggregateExpression())
}
