package graft.streaming

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.core.Tables

/** Structured Streaming surface (SURVEY §2.10: planned extension — the
  * reference has no streaming, but its Redis prediction push and the
  * events table's event-time column map naturally onto
  * readStream → transform → writeStream).
  *
  * Scale: windowed aggregation state is bounded by the watermark; scoring
  * is stateless per micro-batch. Both shapes run unchanged on a cluster
  * with a real source (Kafka/files) swapped in.
  */
object EventStream {

  /** Streaming scan of an events-shaped parquet directory (file source —
    * the local stand-in for a message bus).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(Tables.events)
      .parquet(dir)
      .withColumn("event_time", expr("timestamp_micros(ts div 1000)"))

  /** Watermarked sliding-window counts + value totals per event type. */
  def windowedCounts(events: DataFrame,
      window_ : String = "5 minutes",
      slide: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total"))

  /** Stream-ified scoring (the reference's Redis push shape,
    * predict.py:221-226, as writeStream.foreachBatch): score each
    * micro-batch with a persisted PipelineModel and hand the predictions
    * to the sink callback.
    */
  def scoreStream(stream: DataFrame, model: PipelineModel)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[_] =
    stream.writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(model.transform(batch), id)
      }
}
