package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the Flink interval-join capability
  * (`KeyedStream.intervalJoin` in the reference's platform family)
  * re-expressed as Spark's watermarked stream-stream equi-join with an
  * event-time range predicate.
  *
  * The same helper works on batch frames (plain range join) and on two
  * watermarked streams, where the range predicate is what BOUNDS the
  * join state: each side buffers only rows within watermark ± the
  * interval, so state is O(rate × interval), not O(stream) — the
  * property that makes the join runnable forever at 100 TB/day. Inner
  * matches emit as soon as both sides arrive (no sentinel batch needed);
  * use outer variants only with both watermarks set.
  */
object StreamJoins {

  /** Event-time interval join: rows match when `leftKey = rightKey` and
    * `rightTs ∈ [leftTs + lowerSec, leftTs + upperSec]`. Column names
    * must be disjoint across the two sides (rename before calling —
    * which the streaming watermark forces anyway, since each side needs
    * its own event-time column). */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      lowerSec: Long, upperSec: Long): DataFrame =
    left.join(right, intervalCond(leftKey, rightKey, leftTs, rightTs,
      lowerSec, upperSec))

  /** LEFT OUTER interval join: like [[intervalJoin]], but a left row
    * with no match in its interval still emits — with nulls — once the
    * watermark passes the end of that interval (Spark can only then
    * prove no future match can arrive). Both sides MUST be watermarked;
    * the null-padded rows are exactly the "impressions that never
    * converted", emitted incrementally instead of via a batch anti-join
    * over the full history. */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      lowerSec: Long, upperSec: Long): DataFrame =
    left.join(right, intervalCond(leftKey, rightKey, leftTs, rightTs,
      lowerSec, upperSec), "leftOuter")

  private def intervalCond(leftKey: String, rightKey: String,
      leftTs: String, rightTs: String, lowerSec: Long, upperSec: Long) =
    col(leftKey) === col(rightKey) &&
      col(rightTs) >= col(leftTs) + expr(s"INTERVAL $lowerSec SECONDS") &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $upperSec SECONDS")
}
