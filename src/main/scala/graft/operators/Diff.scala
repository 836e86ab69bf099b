package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the CDC/audit primitive for pipeline
  * re-runs: given two versions of a table and a key, classify every key
  * as `added` (new only), `removed` (old only), or `changed` (present in
  * both with at least one differing compare column), with the list of
  * changed columns. Rows equal on every compare column are dropped by
  * default — at 100 TB the interesting output is the (tiny) delta, not a
  * copy of the table.
  *
  * Plan shape: ONE full-outer shuffle join on the key; presence flags
  * and null-safe column comparisons (`<=>`) are map-side projections on
  * the joined row. Nothing is collected; the delta is a DataFrame to
  * write or aggregate downstream. Comparison is null-safe per column, so
  * a null→value transition counts as a change, and null==null does not.
  */
object Diff {

  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compare: Seq[String],
                   includeUnchanged: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    require(compare.nonEmpty, "snapshotDiff needs at least one compare column")
    def side(df: DataFrame, p: String) = df.select(
      (keys.map(k => col(k).as(s"$p$k")) ++
        compare.map(c => col(c).as(s"$p$c")) :+
        lit(1).as(s"${p}present")): _*)
    val o = side(oldDf, "o_")
    val n = side(newDf, "n_")
    val on = keys.map(k => o(s"o_$k") <=> n(s"n_$k")).reduce(_ && _)
    val joined = o.join(n, on, "full_outer")
    val changedCols = compare.map(c =>
      when(!(col(s"o_$c") <=> col(s"n_$c")), lit(c)))
    val status = when(col("o_present").isNull, lit("added"))
      .when(col("n_present").isNull, lit("removed"))
      .when(changedCols.map(_.isNotNull).reduce(_ || _), lit("changed"))
      .otherwise(lit("unchanged"))
    val out = joined
      .withColumn("status", status)
      .withColumn("changed_cols",
        when(col("status") === "changed",
          concat_ws(",", changedCols: _*)).otherwise(lit("")))
      .select(keys.map(k =>
        coalesce(col(s"o_$k"), col(s"n_$k")).as(k)) ++
        Seq(col("status"), col("changed_cols")): _*)
    if (includeUnchanged) out else out.where(col("status") =!= "unchanged")
  }

  /** SCD Type 2 (slowly-changing-dimension versioning — the warehouse
    * pattern behind every `valid_from`/`valid_to` dimension table): fold
    * a new snapshot into a versioned dimension at one effective instant.
    * Per key — compare-change → the current row CLOSES (valid_to_us =
    * effectiveUs, is_current = false) and a new open version inserts;
    * new key → a new open version; unchanged / absent-from-snapshot →
    * untouched (absence is not a delete: snapshots are additive here).
    * Comparison is null-safe per column (`<=>`), the snapshotDiff rule.
    *
    * Dimension schema contract: `keys ++ compare ++ (valid_from_us,
    * valid_to_us, is_current)` with micros BIGINTs and a null
    * valid_to_us on open rows. `changes` carries `keys ++ compare`.
    *
    * Plan shape: history rows pass through untouched; ONE shuffle join
    * (current ⋈ snapshot, full-outer on the key) classifies everything
    * else, and each joined row emits its 1-2 output versions through a
    * filtered array-explode — never a second pass over the join. At
    * 100 TB the win is the same as MERGE's: prune to partitions the
    * snapshot keys touch before this plan sees them. */
  def scdApply(dim: DataFrame, changes: DataFrame, keys: Seq[String],
               compare: Seq[String], effectiveUs: Long): DataFrame = {
    require(keys.nonEmpty && compare.nonEmpty,
      "scdApply needs key and compare columns")
    val meta = Seq("valid_from_us", "valid_to_us", "is_current")
    require(meta.forall(dim.columns.contains),
      s"dim must carry ${meta.mkString(", ")}")
    val hist = dim.where(!col("is_current"))
    val cur = dim.where(col("is_current"))
      .withColumn("__cp", lit(true))
    val ch = changes.select(
      (keys.map(col) ++ compare.map(c => col(c).as(s"__n_$c")) :+
        lit(true).as("__np")): _*)
    val joined = cur.join(ch, keys, "full_outer")
    val matched = col("__cp").isNotNull && col("__np").isNotNull
    val changed = matched &&
      compare.map(c => !(col(c) <=> col(s"__n_$c"))).reduce(_ || _)
    val newKey = col("__cp").isNull
    def version(vals: String => Column, from: Column, to: Column,
                current: Column) =
      struct((keys.map(col) ++ compare.map(c => vals(c).as(c)) ++
        Seq(from.as("valid_from_us"), to.as("valid_to_us"),
          current.as("is_current"))): _*)
    val keep = when(col("__np").isNull || (matched && !changed),
      version(col, col("valid_from_us"), col("valid_to_us"),
        col("is_current")))
    val closed = when(changed,
      version(col, col("valid_from_us"), lit(effectiveUs), lit(false)))
    val opened = when(changed || newKey,
      version(c => col(s"__n_$c"), lit(effectiveUs),
        lit(null).cast("long"), lit(true)))
    val out = joined
      .select(explode(filter(array(keep, closed, opened),
        v => v.isNotNull)).as("v"))
      .select((keys ++ compare ++ meta).map(c => col(s"v.$c").as(c)): _*)
    hist.select((keys ++ compare ++ meta).map(col): _*).unionByName(out)
  }

  /** ANSI-MERGE semantics as one declarative plan: given a `source` with
    * the SAME schema as `target`, per target key —
    * matched + `deleteWhen`  → row removed;
    * matched + `updateWhen`  → non-key columns replaced by the source's;
    * matched + neither       → row kept as-is;
    * unmatched source + `insertWhen` → row inserted;
    * unmatched target        → row kept.
    * Conditions evaluate over the SOURCE row (the Delta-style subset);
    * omitted conditions default to update-always / delete-never /
    * insert-always, and a condition evaluating to null counts as false
    * (SQL three-valued semantics). `guardUniqueSource` enforces the
    * standard's multiple-matched-rows error lazily and distributed: a
    * window count over the source key feeds `raise_error`, so a
    * duplicate-key source fails the job instead of silently picking a
    * winner.
    *
    * Plan shape: ONE full-outer shuffle join on the key; everything else
    * is map-side projection + filter. A full-outer join cannot broadcast,
    * so MERGE is honestly a shuffle-by-key operator — at 100 TB the win
    * is upstream file pruning (only rewrite partitions the source keys
    * touch, the [[graft.streaming.MergeSink]] bucket strategy), not a
    * different join. */
  def mergeInto(target: DataFrame, source: DataFrame, keys: Seq[String],
                updateWhen: Option[Column] = None,
                deleteWhen: Option[Column] = None,
                insertWhen: Option[Column] = None,
                guardUniqueSource: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "mergeInto needs at least one key column")
    require(target.columns.toSet == source.columns.toSet,
      s"mergeInto needs matching schemas: ${target.columns.mkString(",")} vs " +
        source.columns.mkString(","))
    val dataCols = target.columns.filterNot(keys.contains).toSeq
    def flag(c: Option[Column], dflt: Boolean): Column =
      coalesce(c.getOrElse(lit(dflt)), lit(false))
    // evaluate the conditions BEFORE renaming, so callers write them over
    // plain source column names
    val guarded = if (!guardUniqueSource) source else {
      val w = Window.partitionBy(keys.map(col): _*)
      // raise_error rides the condition columns (one of the three is
      // evaluated on every source-row path), so the guard cannot be
      // pruned away and fires exactly when a duplicate key is TOUCHED
      source.withColumn("__cnt", count(lit(1)).over(w))
    }
    def withGuard(c: Column): Column =
      if (!guardUniqueSource) c
      else when(col("__cnt") > 1,
        raise_error(concat(lit("mergeInto: multiple source rows match key ("),
          concat_ws(",", keys.map(k => col(k).cast("string")): _*), lit(")")))
          .cast("boolean")).otherwise(c)
    val s = guarded
      .withColumn("__upd", withGuard(flag(updateWhen, dflt = true)))
      .withColumn("__del", withGuard(flag(deleteWhen, dflt = false)))
      .withColumn("__ins", withGuard(flag(insertWhen, dflt = true)))
      .select((keys.map(col) ++ dataCols.map(c => col(c).as(s"__s_$c")) ++
        Seq(col("__upd"), col("__del"), col("__ins"),
          lit(true).as("__sp"))): _*)
    val t = target.withColumn("__tp", lit(true))
    val joined = t.join(s, keys, "full_outer")
    val matched = col("__tp").isNotNull && col("__sp").isNotNull
    joined
      .where((col("__sp").isNull) ||                       // target-only
        (col("__tp").isNull && col("__ins")) ||            // insert
        (matched && !col("__del")))                        // keep / update
      .select(keys.map(col) ++ dataCols.map { c =>
        when(col("__tp").isNull, col(s"__s_$c"))           // inserted row
          .when(matched && col("__upd"), col(s"__s_$c"))   // updated row
          .otherwise(col(c)).as(c)
      }: _*)
  }
}
