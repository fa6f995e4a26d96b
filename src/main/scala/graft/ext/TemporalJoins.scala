package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively (the build spec's
  * canonical custom-operator examples). Both are compositions of
  * built-in operators chosen for their shuffle shape — no custom
  * physical operator needed (preference (a) of the spec's ladder).
  */
object TemporalJoins {

  /** As-of join: for every left row, the single right row with the
    * greatest `tsCol` ≤ left's `tsCol` (`direction = "backward"`, the
    * default — DuckDB/kdb `ASOF JOIN` `l.ts >= r.ts`) or the smallest
    * `tsCol` ≥ left's `tsCol` (`direction = "forward"`, DuckDB
    * `l.ts <= r.ts`), within the same `keys` group. With `toleranceMs`,
    * a match further than that many milliseconds from the left timestamp
    * is nulled out (pandas `merge_asof(tolerance=...)` semantics: the
    * row keeps its left side, the payload columns become null).
    *
    * Implementation = ONE sort-shuffle, not a per-row lookup: union both
    * sides tagged, sort by (keys, ts, side) inside each key partition —
    * ts ascending for backward, descending for forward — propagate the
    * last-seen right payload with `last(_, ignoreNulls) over (unbounded
    * preceding → current)`, keep left rows. Right rows sort before left
    * rows on equal ts so an exact-ts match is visible to the left row
    * (inclusive semantics in both directions). The tolerance check is a
    * pure post-projection on the matched right timestamp carried in the
    * fill struct — no extra shuffle.
    *
    * Scale: cost = the sort of |L|+|R| within key groups — the same
    * shuffle a plain grouped window costs; no broadcast or range
    * explosion. Skewed keys inherit the usual remedies (salt the key,
    * AQE skew split).
    *
    * @param payload right-side columns to carry (renamed as given)
    * @param direction `"backward"` (match at-or-before) or `"forward"`
    *   (match at-or-after)
    * @param toleranceMs max |left.ts − right.ts| in ms for a match to
    *   survive; None = unbounded (plain as-of)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payload: Map[String, String],
               direction: String = "backward",
               toleranceMs: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    val lCols = left.columns
    // tag: right = 0, left = 1 → right sorts first on ties (inclusive)
    val l = left.withColumn("__side", lit(1))
      .withColumns(payload.map { case (out, _) => out -> lit(null) }.toMap)
    val r0 = payload.foldLeft(right) { case (d, (out, in)) =>
      d.withColumn(out, col(in)) }
    val r = r0.select((keys :+ tsCol).map(col) ++ payload.keys.map(col): _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val tsOrder = if (direction == "backward") col(tsCol).asc else col(tsCol).desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // propagate the last right ROW as one struct, not per-column fills:
    // independent per-column last(ignoreNulls) would stitch values from
    // DIFFERENT right rows whenever a right payload carries nulls (and
    // resurrect older non-null values over a legitimately-null latest).
    // The right row's own timestamp rides along for the tolerance check.
    val outs = payload.keys.toSeq
    val rowStruct = when(col("__side") === 0,
      struct((outs.map(col) :+ col(tsCol).alias("__rts")): _*))
    val filled = unioned.withColumn("__r",
      last(rowStruct, ignoreNulls = true).over(w))
    val inTol: Column = toleranceMs match {
      case None => lit(true)
      case Some(tol) =>
        // numeric ts columns are taken AS millis: casting a long through
        // timestamp would read epoch-SECONDS and scale the tolerance
        // 1000×; sign is fixed by construction (backward: l ≥ r,
        // forward: r ≥ l), abs covers both directions
        val numericTs = left.schema(tsCol).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType]
        def ms(c: Column) =
          if (numericTs) c.cast("long")
          else unix_millis(c.cast("timestamp"))
        abs(ms(col(tsCol)) - ms(col("__r.__rts"))) <= tol
    }
    filled.filter(col("__side") === 1)
      .select(lCols.map(col) ++
        outs.map(o => when(inTol, col(s"__r.$o")).alias(o)): _*)
  }

  /** Range join on a time interval: pairs (l, r) with
    * `r.ts ∈ [l.ts, l.ts + windowMs)`. Implemented with coarse
    * time-bucket banding: both sides bucket by `windowMs`-sized epochs,
    * candidates join on bucket∈{b, b+1} (each interval spans ≤ 2
    * buckets), then the exact predicate filters. Turns an O(|L|·|R|)
    * theta-join into an equi-join with 2× fan-out — the standard
    * banding decomposition for interval joins at scale.
    *
    * Because the output is a COUNT, the right side pre-aggregates to
    * per-timestamp counts BEFORE the band join (round 7): the join then
    * fans out per distinct timestamp instead of per row, and the final
    * aggregate sums the pre-counts. Semantically identical always;
    * when right-side timestamps repeat (date-granular columns, event
    * logs with hot seconds) the candidate volume drops by the repeat
    * factor (measured 1.8 M → 2.5 k join rows per bucket pair at
    * sf0.3, 5.3 s → sub-second); in the worst all-distinct case it
    * adds one map-side-combining shuffle of the same cardinality. */
  def rangeJoinCount(left: DataFrame, lTs: String,
                     right: DataFrame, rTs: String,
                     windowMs: Long, lKeyCols: Seq[String]): DataFrame = {
    // cast through TIMESTAMP: parquet NTZ timestamps reject unix_millis
    // directly (session TZ is pinned UTC, so the cast is value-preserving)
    def ms(c: Column) = unix_millis(c.cast("timestamp"))
    val lb = left.withColumn("__b", floor(ms(col(lTs)) / windowMs))
      .withColumn("__bucket", explode(array(col("__b"), col("__b") + 1)))
    val rb = right.select(col(rTs).alias("__rts"))
      .groupBy(col("__rts")).agg(count(lit(1)).alias("__rn"))
      .withColumn("__bucket", floor(ms(col("__rts")) / windowMs))
    lb.join(rb, Seq("__bucket"))
      .filter(col("__rts") >= col(lTs) &&
        ms(col("__rts")) < ms(col(lTs)) + windowMs)
      .groupBy(lKeyCols.map(col): _*)
      .agg(sum(col("__rn")).alias("n_in_range"))
  }
}
