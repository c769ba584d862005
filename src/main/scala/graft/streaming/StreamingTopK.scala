package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Running top-k per key over a stream: the streaming twin of
  * [[graft.functions.TopKAggregator]], with the SAME bounded buffer as
  * the per-key state (score DESC, id ASC, ties on id). Each trigger
  * folds the batch's rows into the stored buffer and emits the key's
  * current top-k — state size is O(k) per key forever, the property that
  * lets the query run unbounded (no watermark needed: top-k over all
  * history is monotone, old entries can only be displaced, never
  * revived).
  *
  * Use Update output mode; each emitted row supersedes the key's
  * previous one.
  */
object StreamingTopK {

  /** @param rows (key, score, id) stream
    * @return (key, top ids best-first, matching scores) per trigger */
  def runningTopK(spark: SparkSession, rows: Dataset[(Long, Double, Long)],
                  k: Int): Dataset[(Long, Seq[Long], Seq[Double])] = {
    import spark.implicits._
    val agg = new graft.functions.TopKAggregator(k)
    rows.groupByKey(_._1)
      .mapGroupsWithState[Array[(Double, Long)], (Long, Seq[Long], Seq[Double])](
        GroupStateTimeout.NoTimeout) { (key, it, state) =>
        val folded = it.foldLeft(state.getOption.getOrElse(agg.zero)) {
          (buf, r) => agg.reduce(buf, (r._2, r._3))
        }
        state.update(folded)
        (key, folded.toSeq.map(_._2), folded.toSeq.map(_._1))
      }
  }
}
