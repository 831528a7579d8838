package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING BENFORD AUDIT — the 16th maintained streaming
  * structure: the fraud screen's digit distribution kept current as
  * events arrive. The batch audit ([[graft.operators.Analytics
  * .eventsBenford]]) is a 9-row count aggregate, and counts ADD — so
  * the streaming form is Structured Streaming's own aggregation
  * state folding micro-batch partials, bounded at 9 rows forever (no
  * watermark needed: the digit key space is fixed, the canonical
  * bounded-state shape). The digit projection is the SAME function
  * the batch query uses (Analytics.benfordDigits — stateless, so it
  * runs unchanged over a stream), which is what pins stream ≡ batch:
  * the spec feeds arrival-scrambled waves and compares the final
  * counts to the oracled batch audit bit-for-bit.
  */
object BenfordStream {

  /** Complete-mode digit-count aggregate over a streaming events
    * frame (needs `value`). State = 9 (digit, n_obs) rows.
    */
  def counts(events: DataFrame): DataFrame =
    graft.operators.Analytics.benfordDigits(events)
      .groupBy("digit")
      .agg(count(lit(1)).as("n_obs"))
}
