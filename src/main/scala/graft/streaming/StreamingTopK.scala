package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HeavyHitters

/** Streaming trending-values: event-time tumbling windows × the
  * SpaceSaving topK summary ([[HeavyHitters]]). The summary is a
  * PROVABLY mergeable sketch (Agarwal et al.), so Structured Streaming's
  * incremental state merges — partial batch summary OR'd into the state
  * store's summary per window — preserve the SpaceSaving guarantee
  * exactly like the batch partial/final merge does. State per window is
  * O(cap), independent of stream volume; windows close and emit when the
  * watermark passes.
  */
object StreamingTopK {

  /** @param events     streaming DataFrame with an event-time column
    * @param tsCol      event-time timestamp column
    * @param valueCol   the value whose most-frequent entries are tracked
    * @param windowDur  tumbling window duration, e.g. "1 minute"
    * @param n          top-N to report per window
    */
  def trendingTopK(events: DataFrame, tsCol: String, valueCol: String,
                   windowDur: String, n: Int,
                   watermarkDelay: String = "0 seconds"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(HeavyHitters.topK(col(valueCol), n).as("top_values"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("top_values"), col("n_events"))
}
