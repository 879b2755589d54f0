package graft.streaming

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}

/** Connector-shaped sinks via foreachBatch — the Spark-native rendering of
  * the reference's buffered external writers. The actual transport is a
  * pluggable serializable function: the sandbox has no ClickHouse/ES, so
  * tests inject collectors; production wires JDBC/REST executors. The
  * batching, flush, and routing semantics — the parts the reference
  * implements — are real and tested.
  */
object BatchedSinks {

  /** Batched multi-endpoint writer ≙ ClickhouseSink
    * (`rlink-connectors/connector-clickhouse/src/clickhouse_sink.rs:27-259`):
    * rows buffered to `batchSize` per partition and flushed per group; the
    * endpoint is chosen round-robin by task/partition number
    * (`clickhouse_sink.rs:62-69`). Used as
    * `writeStream.foreachBatch(sink.foreachBatchFn)` or directly on a
    * batch DataFrame.
    */
  final class BatchedJdbcShapedSink(
      urls: Seq[String], batchSize: Int,
      insert: (String, Seq[Row]) => Unit) extends Serializable {

    def write(df: DataFrame): Unit = {
      val (us, bs, ins) = (urls, batchSize, insert)
      df.foreachPartition { it: Iterator[Row] =>
        val url = us(TaskContext.getPartitionId() % us.size)
        it.grouped(bs).foreach(g => ins(url, g.toSeq))
      }
    }

    def foreachBatchFn: (DataFrame, Long) => Unit = (df, _) => write(df)
  }

  /** One bulk-API action ≙ the ES converter output
    * (`connector-elasticsearch/src/elasticsearch_sink.rs:57-248`). */
  final case class IndexAction(index: String, id: String, body: String)

  /** Bulk index writer ≙ ElasticsearchOutputFormat: converter to actions,
    * grouped into bulk requests of `bulkSize`. */
  final class BulkIndexShapedSink(
      converter: Row => IndexAction, bulkSize: Int,
      send: Seq[IndexAction] => Unit) extends Serializable {

    def write(df: DataFrame): Unit = {
      val (conv, bs, snd) = (converter, bulkSize, send)
      df.foreachPartition { it: Iterator[Row] =>
        it.map(conv).grouped(bs).foreach(g => snd(g.toSeq))
      }
    }

    def foreachBatchFn: (DataFrame, Long) => Unit = (df, _) => write(df)
  }
}
