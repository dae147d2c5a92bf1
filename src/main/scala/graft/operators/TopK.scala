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
    private def trim(items: Seq[(Double, Long)]): Seq[(Double, Long)] =
      items.sortBy { case (p, o) => (-p, o) }.take(k)

    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, r: OrderRow): Buf =
      Buf(trim(b.items :+ ((r.o_totalprice, r.o_orderkey))))
    override def merge(a: Buf, b: Buf): Buf = Buf(trim(a.items ++ b.items))
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
