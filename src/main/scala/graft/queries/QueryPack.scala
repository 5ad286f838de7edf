package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries plus their DuckDB oracle twins.
  *
  * Contract (driver-enforced, see SparkEntry):
  *  - every query ends in a total ORDER BY (hash compare is row-ordered);
  *  - column names/aliases match the oracle SQL exactly;
  *  - double aggregates go through graft.util.Det for order-independence;
  *  - oracle SQL must run on DuckDB 1.0.0 against views named after the
  *    fixture tables (lineitem, orders, ..., documents, embeddings).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** Subset of `queries` keys that are ANSI-SQL-expressible. */
  def oracle: Map[String, String]
}
