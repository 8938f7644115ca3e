package graft

import org.apache.spark.sql.DataFrame

/** Central lease registry for intermediate frames that queries cache and
  * cannot unpersist themselves: the frames must stay resident until the
  * RETURNED DataFrame is consumed (an action the builder never sees), so
  * the release point is necessarily the caller's. The gate harnesses
  * (Bench/Verify/ScaleBench/QTime) call `spark.catalog.clearCache()`
  * after every query; a LIBRARY caller composing these operators calls
  * [[Caches.release]] after consuming each result instead — without it,
  * repeated calls accumulate MEMORY_AND_DISK blocks (one or two leased
  * frames per invocation of the leasing queries). */
object Caches {
  private val live = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Cache `df` and remember it for [[release]]. */
  def lease(df: DataFrame): DataFrame = synchronized {
    live += df
    df.cache()
  }

  /** Unpersist every leased frame (non-blocking) and forget them. */
  def release(): Unit = synchronized {
    live.foreach(_.unpersist(false))
    live.clear()
  }
}
