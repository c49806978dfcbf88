package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: keeps the k best (score desc, id asc) pairs.
  *
  * Scale rationale: ranking neighbors with a Window over partitionBy(query)
  * shuffles every scored candidate row to the query's partition (skew: one
  * partition per query holds the whole corpus). This aggregator does
  * partial top-k map-side, so only Q×k rows cross the wire — the same
  * per-partition-then-global pattern Spark applies to ORDER BY ... LIMIT
  * (TakeOrderedAndProject), available for groupBy.
  */
object TopK {

  /** (score, id) with the ranking order: higher score first, lower id on ties. */
  type Scored = (Double, Long)

  private def better(a: Scored, b: Scored): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Insertion-sorted bounded buffer (k is small; O(k) merge per row). */
  def topKAggregator(k: Int): Aggregator[Scored, Seq[Scored], Seq[Scored]] =
    new Aggregator[Scored, Seq[Scored], Seq[Scored]] {
      def zero: Seq[Scored] = Vector.empty
      def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] = insert(buf, x)
      def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
        b.foldLeft(a)(insert)
      def finish(buf: Seq[Scored]): Seq[Scored] = buf
      def bufferEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
      def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

      private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] = {
        if (buf.size == k && !better(x, buf.last)) buf
        else {
          val i = buf.indexWhere(e => better(x, e)) match {
            case -1 => buf.size
            case n  => n
          }
          val grown = (buf.take(i) :+ x) ++ buf.drop(i)
          if (grown.size > k) grown.take(k) else grown
        }
      }
    }
}
