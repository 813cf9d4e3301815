package graft.serve

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** Batched result serving — the zero-egress analogue of the reference's
  * Arrow Flight `do_get` (reference: src/flight_server/server.py:41
  * streams a table in 10k-row record batches). `toLocalIterator` pulls
  * one partition at a time to the driver, so serving a 100 TB result
  * never materializes it driver-side; batches bound the consumer's
  * working set exactly like Flight's stream chunks.
  */
object ServingApi {
  val DefaultBatchSize = 10000

  final case class ResultStream(schema: StructType, batches: Iterator[Seq[Row]])

  /** Stream a DataFrame as size-bounded row batches (reference:
    * server.py:52 `_table_generator`). */
  def stream(df: DataFrame, batchSize: Int = DefaultBatchSize): ResultStream =
    ResultStream(df.schema, df.toLocalIterator().asScala.grouped(batchSize))

  /** Schema lookup without executing — the analogue of
    * `get_flight_info` (reference: server.py:19). */
  def flightInfo(df: DataFrame): StructType = df.schema

  /** Catalog listing: table name → schema for the served corpus — the
    * analogue of `list_flights` (reference: server.py:14). */
  def listTables(spark: org.apache.spark.sql.SparkSession, dir: String): Map[String, StructType] =
    graft.Tables.names.map(n => n -> graft.Tables.load(spark, dir, n).schema).toMap

  private implicit class RichJIterator[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
