package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** Case-class entities for the core tables (SURVEY §1.1: typed
  * `Dataset[T]` where type safety helps, `DataFrame` where schema is
  * dynamic). Field names and types mirror the parquet schemas exactly
  * so `.as[T]` is a zero-cost schema assertion — a misnamed or
  * mistyped column fails at analysis instead of producing nulls three
  * operators later.
  *
  * Scale note: the typed API is used with COLUMN expressions (filters,
  * aggregates), which keep predicate pushdown and pruning; typed
  * lambdas (`ds.filter(f: T => Boolean)`) deserialize whole rows and
  * black-box the predicate from Catalyst — reserved for logic that
  * genuinely cannot be expressed in columns (see TypedOps scaladoc).
  */
object Entities {
  final case class Region(r_regionkey: Int, r_name: String)
  final case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
  final case class Supplier(s_suppkey: Long, s_name: String,
      s_nationkey: Int, s_acctbal: Double)
  final case class Customer(c_custkey: Long, c_name: String,
      c_nationkey: Int, c_acctbal: Double, c_mktsegment: String)
  final case class Part(p_partkey: Long, p_name: String, p_brand: String,
      p_type: String, p_size: Int, p_retailprice: Double)
  final case class Order(o_orderkey: Long, o_custkey: Long,
      o_orderstatus: String, o_totalprice: Double, o_orderdate: Timestamp,
      o_orderpriority: String)
  final case class Lineitem(l_orderkey: Long, l_partkey: Long,
      l_suppkey: Long, l_linenumber: Int, l_quantity: Double,
      l_extendedprice: Double, l_discount: Double, l_tax: Double,
      l_returnflag: String, l_linestatus: String, l_shipdate: Timestamp)
  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
  final case class Document(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
  final case class Embedding(vec_id: Long, embedding: Array[Float],
      label: Int)
}

/** Typed loaders — `Tables` returns DataFrames; these assert the
  * schema into the matching case class. */
object TypedTables {
  import Entities._

  def region(s: SparkSession, d: String): Dataset[Region] =
    { import s.implicits._; Tables.region(s, d).as[Region] }
  def nation(s: SparkSession, d: String): Dataset[Nation] =
    { import s.implicits._; Tables.nation(s, d).as[Nation] }
  def supplier(s: SparkSession, d: String): Dataset[Supplier] =
    { import s.implicits._; Tables.supplier(s, d).as[Supplier] }
  def customer(s: SparkSession, d: String): Dataset[Customer] =
    { import s.implicits._; Tables.customer(s, d).as[Customer] }
  def part(s: SparkSession, d: String): Dataset[Part] =
    { import s.implicits._; Tables.part(s, d).as[Part] }
  def orders(s: SparkSession, d: String): Dataset[Order] =
    { import s.implicits._; Tables.orders(s, d).as[Order] }
  def lineitem(s: SparkSession, d: String): Dataset[Lineitem] =
    { import s.implicits._; Tables.lineitem(s, d).as[Lineitem] }
  def events(s: SparkSession, d: String): Dataset[Event] =
    { import s.implicits._; Tables.events(s, d).as[Event] }
  def documents(s: SparkSession, d: String): Dataset[Document] =
    { import s.implicits._; Tables.documents(s, d).as[Document] }
  def embeddings(s: SparkSession, d: String): Dataset[Embedding] =
    { import s.implicits._; Tables.embeddings(s, d).as[Embedding] }
}
