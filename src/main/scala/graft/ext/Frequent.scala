package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Exact φ-heavy hitters at corpus scale — the ClickHouse `topK()` /
  * frequent-items use case (which tokens/domains/users dominate the
  * stream), rebuilt as the scalable two-pass sketch-then-verify shape:
  *
  *  1. PASS 1 (one scan, no shuffle): a Misra–Gries summary per
  *     partition. Pigeonhole: any item with global count ≥ φN must have
  *     count_p > n_p/(cap+1) in at least one partition p (cap ≥ 2/φ),
  *     so the union of per-partition survivors is a guaranteed SUPERSET
  *     of the φ-heavy hitters. Each summary is ≤ cap entries, so the
  *     driver collects O(partitions × cap) — independent of data size.
  *  2. PASS 2 (one scan, aggregation over ~cap items): exact counts of
  *     the candidates via a broadcast semi-join, filtered at the φN
  *     threshold.
  *
  * The output is therefore EXACT (deterministic, oracle-able as a plain
  * GROUP BY ... HAVING) while neither pass ever shuffles the raw
  * stream: pass 1 is map-only, pass 2 aggregates a ≤cap-key frame. A
  * naive `groupBy(item).count()` shuffles every distinct item — at
  * 100 TB with billions of distinct keys that is the bottleneck this
  * operator exists to avoid. ClickHouse's topK is approximate
  * (SpaceSaving estimates); the verify pass upgrades it to exact for
  * one extra scan.
  */
object Frequent {

  /** Misra–Gries streaming summary: at most `cap` tracked items;
    * undercounts by ≤ n/(cap+1). Decrement-all amortizes to O(n): each
    * decrement round removes cap+1 from total tracked mass. */
  private[graft] def misraGries(
      it: Iterator[String], cap: Int): collection.Map[String, Long] = {
    val m = collection.mutable.HashMap.empty[String, Long]
    while (it.hasNext) {
      val x = it.next()
      m.get(x) match {
        case Some(c) => m.update(x, c + 1)
        case None if m.size < cap => m.update(x, 1L)
        case None =>
          val dead = List.newBuilder[String]
          m.foreachEntry { (k, v) =>
            if (v == 1L) dead += k else m.update(k, v - 1) }
          dead.result().foreach(m.remove)
      }
    }
    m
  }

  /** Weighted Misra–Gries (Berinde et al., PODS'09): each eviction
    * round subtracts the map's minimum from every entry, removing at
    * least one — total subtracted mass ≤ W/(cap+1), so any item with
    * weight > W/(cap+1) survives. Decrement rounds are O(cap) per
    * untracked arrival (not amortized away as in the unit-weight case);
    * fine for the row-weighted use (revenue per key), use the
    * unweighted path for token streams. */
  private[graft] def misraGriesWeighted(
      it: Iterator[(String, Long)], cap: Int): collection.Map[String, Long] = {
    val m = collection.mutable.HashMap.empty[String, Long]
    while (it.hasNext) {
      val (x, w) = it.next()
      if (w > 0) {
        m.get(x) match {
          case Some(c) => m.update(x, c + w)
          case None =>
            m.update(x, w)
            if (m.size > cap) {
              var d = Long.MaxValue
              m.foreachEntry { (_, v) => if (v < d) d = v }
              val dead = List.newBuilder[String]
              m.foreachEntry { (k, v) =>
                if (v <= d) dead += k else m.update(k, v - d) }
              dead.result().foreach(m.remove)
            }
        }
      }
    }
    m
  }

  /** All items of `itemCol` with count ≥ ceil(phi * N), with their exact
    * counts — columns (itemCol, n). Requires 0 < phi < 1; memory per
    * task is O(2/phi). */
  def heavyHitters(df: DataFrame, itemCol: String, phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1), got $phi")
    val cap = math.max(8, math.ceil(2.0 / phi).toInt)
    // Pass 1: per-partition summaries + per-partition row counts in one
    // scan. The count marker rides along as a (null-item) row so N needs
    // no second job.
    // null items are excluded up front: they could never match the
    // pass-2 equality probe anyway, and the null slot doubles as the
    // per-partition row-count marker below
    val summaries: Array[(String, Long)] = df
      .where(col(itemCol).isNotNull)
      .select(col(itemCol).cast("string").as("item"))
      .as[String](Encoders.STRING)
      .mapPartitions { it =>
        var n = 0L
        val counted = it.map { x => n += 1; x }
        val m = misraGries(counted, cap)
        (m.iterator.map { case (k, v) => (k, v) } ++
          Iterator.single((null: String, n))).toList.iterator
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .collect()
    val (threshold, candDf) = thresholdAndCandidates(df, summaries, phi)
    // Pass 2: exact verify — broadcast semi-join prunes the scan to the
    // candidate set before the (≤ cap-key) aggregation.
    df.join(
        broadcast(candDf),
        col(itemCol).cast("string") === col("__cand"), "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= threshold)
  }

  /** Shared pass-1 → pass-2 bridge: total mass and candidates out of
    * the collected summaries (null-keyed rows are the per-partition
    * mass markers). */
  private def thresholdAndCandidates(
      df: DataFrame, summaries: Array[(String, Long)],
      phi: Double): (Long, DataFrame) = {
    val total = summaries.collect { case (null, n) => n }.sum
    val threshold = math.ceil(phi * total).toLong
    val candidates = summaries
      .collect { case (k, _) if k != null => k }.distinct.toIndexedSeq
    val candDf = df.sparkSession
      .createDataset(candidates)(Encoders.STRING).toDF("__cand")
    (threshold, candDf)
  }

  /** Weighted φ-heavy hitters (ClickHouse `topKWeighted` upgraded to
    * exact): items whose summed `weightCol` ≥ ceil(phi * totalWeight),
    * with exact sums — columns (itemCol, w). Same two-pass shape as
    * [[heavyHitters]] with the weighted sketch in pass 1. Non-positive
    * weights are ignored (the sketch guarantee needs a monotone mass). */
  def heavyHittersWeighted(
      df: DataFrame, itemCol: String, weightCol: String,
      phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1), got $phi")
    val cap = math.max(8, math.ceil(2.0 / phi).toInt)
    val rows = df
      .where(col(itemCol).isNotNull && col(weightCol) > 0)
      .select(col(itemCol).cast("string").as("item"),
        col(weightCol).cast("long").as("w"))
    val summaries: Array[(String, Long)] = rows
      .as[(String, Long)](Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .mapPartitions { it =>
        var total = 0L
        val counted = it.map { xw => total += xw._2; xw }
        val m = misraGriesWeighted(counted, cap)
        (m.iterator.map { case (k, v) => (k, v) } ++
          Iterator.single((null: String, total))).toList.iterator
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .collect()
    val (threshold, candDf) = thresholdAndCandidates(df, summaries, phi)
    df.where(col(itemCol).isNotNull && col(weightCol) > 0)
      .join(
        broadcast(candDf),
        col(itemCol).cast("string") === col("__cand"), "left_semi")
      .groupBy(col(itemCol))
      .agg(sum(col(weightCol).cast("long")).as("w"))
      .where(col("w") >= threshold)
  }

  /** Keyed Misra–Gries state for [[heavyHittersStream]]. */
  private[graft] final case class MgWindowState(
      counts: Map[String, Long], n: Long)

  /** Streaming windowed φ-heavy hitters: a Misra–Gries sketch per
    * (tumbling window, shard) held in keyed state, emitted when the
    * WATERMARK closes the window — the streaming half of the batch
    * operator's pass 1. Single-pass streaming cannot re-scan for the
    * exact verify, so the contract is the sketch's own guarantee, made
    * explicit in the output: `count_lb ≤ true ≤ count_lb + n/(cap+1)`
    * and every TRUE φ-hitter of the (window, shard) stream is emitted
    * (the emission test `count_lb + n/(cap+1) ≥ φ·n` is the pigeonhole
    * superset bound; cap = max(8, ⌈2/φ⌉) keeps the slack ≤ φn/2).
    * Downstream exact-ification, when wanted, is a per-closed-window
    * batch verify over cheap candidate keys — exactly pass 2.
    *
    * Scale shape: `shards` spreads one window's state over
    * `hash(item) % shards` keys — an item's full count still lands in
    * ONE shard (hash partitioning), so per-shard thresholds only widen
    * the superset (n_shard ≤ n_window), never miss a hitter. State per
    * key is ≤ cap entries + a long, bounded by construction; windows
    * close at `window end` under the watermark `delay`, so state
    * lifetime is horizon-bounded like the other streaming ops.
    * `tsCol` must be TimestampType. Output (append, one batch row set
    * per closed window×shard): (window_start_us, shard, item,
    * count_lb, shard_n). */
  def heavyHittersStream(
      events: DataFrame, itemCol: String, tsCol: String,
      windowUs: Long, phi: Double, delay: String,
      shards: Int = 1): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(phi > 0 && phi < 1, s"phi must be in (0,1), got $phi")
    require(windowUs > 0 && shards > 0, "heavyHittersStream: bad params")
    val cap = math.max(8, math.ceil(2.0 / phi).toInt)
    val spark = events.sparkSession
    import spark.implicits._
    val us = unix_micros(col(tsCol))
    events
      .withWatermark(tsCol, delay)
      .where(col(itemCol).isNotNull)
      .select(
        (us - pmod(us, lit(windowUs))).as("_win"),
        pmod(xxhash64(col(itemCol)), lit(shards.toLong)).cast("int")
          .as("_shard"),
        col(itemCol).cast("string").as("_item"),
        col(tsCol)) // watermarked column carried for EventTimeTimeout
      .as[(Long, Int, String, java.sql.Timestamp)]
      .groupByKey(t => (t._1, t._2))
      .flatMapGroupsWithState[MgWindowState, (Long, Int, String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state) =>
          if (state.hasTimedOut) {
            val s = state.getOption.getOrElse(MgWindowState(Map.empty, 0L))
            state.remove()
            val slack = s.n / (cap + 1)
            s.counts.iterator
              .filter { case (_, c) => c + slack >= phi * s.n }
              .map { case (item, c) => (key._1, key._2, item, c, s.n) }
          } else {
            val prev = state.getOption.getOrElse(MgWindowState(Map.empty, 0L))
            val m = collection.mutable.HashMap.empty[String, Long]
            m ++= prev.counts
            var n = prev.n
            it.foreach { t =>
              n += 1
              m.get(t._3) match {
                case Some(c) => m.update(t._3, c + 1)
                case None if m.size < cap => m.update(t._3, 1L)
                case None => // decrement-all MG step
                  m.mapValuesInPlace((_, c) => c - 1)
                  m.filterInPlace((_, c) => c > 0)
              }
            }
            state.update(MgWindowState(m.toMap, n))
            // window closes when the watermark (already lagged by
            // `delay`) passes its end
            state.setTimeoutTimestamp(math.max(
              (key._1 + windowUs) / 1000L + 1L,
              state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
      .toDF("window_start_us", "shard", "item", "count_lb", "shard_n")
  }
}
