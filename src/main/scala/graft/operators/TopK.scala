package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

import graft.Tables

/** Top-K per key as a typed Aggregator — the scale path for grouped
  * top-N.
  *
  * q24 expresses the same semantics with a ranked window, which
  * shuffles EVERY row to its key's partition and sorts it. The
  * Aggregator instead keeps a bounded K-element buffer per key and
  * Spark runs it as a partial+final aggregate: each map task emits at
  * most K rows per key into the shuffle. At 100 TB / heavy keys that
  * turns an all-rows shuffle-sort into a K-bounded combine — the same
  * result set, verified against the identical DuckDB oracle.
  */
object TopK {

  final case class OrderRow(o_custkey: Long, o_orderkey: Long, o_totalprice: Double)

  /** Bounded buffer of (totalprice, orderkey), kept sorted by
    * (price desc, orderkey asc) and trimmed to k. */
  final case class Buf(items: Seq[(Double, Long)])

  final class TopKOrders(k: Int) extends Aggregator[OrderRow, Buf, Seq[(Long, Double)]] {
    // rank order: higher price first, then lower orderkey
    private def before(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    override def zero: Buf = Buf(Nil)

    /** O(K) insertion into the already-sorted buffer — the per-row hot
      * path; re-sorting the whole buffer per input row would pay
      * O(K log K) on every single row of a 100 TB scan. A row that
      * can't beat the current k-th is rejected in O(1). */
    override def reduce(b: Buf, r: OrderRow): Buf = {
      val x = (r.o_totalprice, r.o_orderkey)
      if (b.items.size >= k && !before(x, b.items.last)) b
      else {
        val (pre, post) = b.items.span(before(_, x))
        Buf((pre ++ (x +: post)).take(k))
      }
    }

    /** O(K) two-pointer merge of two sorted buffers (combiner path). */
    override def merge(a: Buf, b: Buf): Buf = {
      val xs = a.items.toIndexedSeq
      val ys = b.items.toIndexedSeq
      val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      var i = 0
      var j = 0
      while (out.size < k && (i < xs.size || j < ys.size)) {
        if (j >= ys.size || (i < xs.size && before(xs(i), ys(j)))) { out += xs(i); i += 1 }
        else { out += ys(j); j += 1 }
      }
      Buf(out.toSeq)
    }
    override def finish(b: Buf): Seq[(Long, Double)] =
      b.items.map { case (p, o) => (o, p) }
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  }

  /** q36 — grouped top-3 via the Aggregator; same output contract (and
    * oracle) as q24's window form. */
  def q36(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.df(s, d, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .as[OrderRow]
      .groupByKey(_.o_custkey)
      .agg(new TopKOrders(3).toColumn.name("top"))
      .flatMap { case (ck, items) =>
        items.zipWithIndex.map { case ((okey, price), i) => (ck, okey, price, i + 1) }
      }
      .toDF("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  val all: Seq[Q] = Seq(
    Q("q36_topn_agg", Some(
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin), q36))
}
