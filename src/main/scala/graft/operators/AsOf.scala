package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** As-of (a.k.a. "last tick") join — for every left row, the single right
  * row with the greatest `rightTime <= leftTime` within the same key
  * group. Spark has no native ASOF join; the idiomatic scale formulation
  * is the union + keyed-window pass used here:
  *
  *   1. tag both inputs and union them (right rows carry their payload in
  *      one struct column, left rows a null struct);
  *   2. one window per key ordered by `(time, tag)` — right rows sort
  *      before left rows at equal times, making the match inclusive —
  *      takes `last(payload, ignoreNulls = true)`;
  *   3. keep the left rows, now carrying the latest preceding payload.
  *
  * Cost shape: ONE shuffle on the key and one sort — identical to a
  * sort-merge join — regardless of how many right rows precede each left
  * row; there is no per-pair work, no range explosion. Skewed keys
  * behave like any keyed window (salt the key upstream if one group
  * dominates). This is the plan a range-join rewrite would have to beat.
  *
  * Ties inside the right side (duplicate `(key, time)`) must be resolved
  * upstream (aggregate to one row per instant) — the window keeps
  * whichever sorts last, so dedupe for determinism.
  */
object AsOf {

  /** `left` joined as-of against `right`; the right payload columns come
    * back in a nullable struct column `asof` (null = no preceding right
    * row). `rightValues` must not collide with left column names. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    // a null right time must match nothing — unguarded it would sort
    // NULLS FIRST and its payload would precede every left row
    val r = right.where(col(rightTime).isNotNull).select(
      col(key),
      col(rightTime).cast("long").as("__t"),
      struct(rightValues.map(col): _*).as("__rv"))
      .withColumn("__is_left", lit(0))
    val l = left
      .withColumn("__t", col(leftTime).cast("long"))
      .withColumn("__rv", lit(null).cast(r.schema("__rv").dataType))
      .withColumn("__is_left", lit(1))

    val w = Window.partitionBy(key).orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r, allowMissingColumns = true)
      .withColumn("asof", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__is_left") === 1)
      .drop("__t", "__rv", "__is_left")
  }

  /** [[asofJoin]] with a staleness TOLERANCE (the pandas `merge_asof
    * tolerance` / kdb `wj` refinement): a preceding right row older than
    * `tolerance` time units does NOT match — `asof` comes back null, as
    * if no quote existed. The stale-quote guard every market-data and
    * sensor pipeline wants: an hours-old reading is worse than none.
    *
    * Same single union + keyed window as [[asofJoin]] — the matched
    * right TIME rides the same window pass (a second `last` over the
    * identical frame, one Window node), and the tolerance test is a
    * per-row projection. No extra shuffle, no per-pair work. */
  def asofJoinTolerance(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      tolerance: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val r = right.where(col(rightTime).isNotNull).select(
      col(key),
      col(rightTime).cast("long").as("__t"),
      struct(rightValues.map(col): _*).as("__rv"))
      .withColumn("__is_left", lit(0))
    val l = left
      .withColumn("__t", col(leftTime).cast("long"))
      .withColumn("__rv", lit(null).cast(r.schema("__rv").dataType))
      .withColumn("__is_left", lit(1))

    val w = Window.partitionBy(key).orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__mt",
        last(when(col("__is_left") === 0, col("__t")), ignoreNulls = true)
          .over(w))
      .withColumn("asof",
        when(col("__t") - col("__mt") <= tolerance,
          last(col("__rv"), ignoreNulls = true).over(w)))
      .where(col("__is_left") === 1)
      .drop("__t", "__rv", "__is_left", "__mt")
  }
}
