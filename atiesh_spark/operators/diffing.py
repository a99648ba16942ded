"""Snapshot diff: classify rows across two versions of a table.

The change-data report a pipeline produces when a dataset is re-ingested
or re-derived: which keys appeared, disappeared, or changed, and which
columns changed. Downstream consumers use it for incremental refresh
(process only `added`+`changed`), audit (unexpected `removed` spikes),
and regression gating (a re-run of a deterministic stage must diff
empty).

Plan shape: ONE full-outer sort-merge join on the key columns — the
minimal shuffle for this semantics. At 100 TB both snapshots live
bucketed by the same keys, making the join shuffle-free; AQE skew-join
splits oversized key partitions otherwise. Column comparison is
null-safe codegen (`<=>`), never a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STATUS_ADDED = "added"
_STATUS_REMOVED = "removed"
_STATUS_CHANGED = "changed"
_STATUS_UNCHANGED = "unchanged"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two snapshots by key: (keys..., status, changed_cols, n_changed).

    ``status`` is one of added (key only in ``new``), removed (only in
    ``old``), changed (present in both, >=1 compare column differs
    null-safely), unchanged. ``changed_cols`` is the comma-joined sorted
    list of differing column names ('' unless changed) — a string, not
    an array, so reports serialize identically in any engine.
    ``compare_cols`` defaults to all non-key columns common to both
    sides, sorted for a deterministic report layout.

    Diff semantics assume ``keys`` is a primary key on both sides;
    duplicate keys fan out through the join (standard outer-join
    behavior) — deduplicate first if the snapshots are not keyed.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    for k in keys:
        if k not in old.columns or k not in new.columns:
            raise KeyError(f"key column {k!r} missing from one side")
    if compare_cols is None:
        compare_cols = sorted(
            (set(old.columns) & set(new.columns)) - set(keys)
        )
    for c in compare_cols:
        if c not in old.columns or c not in new.columns:
            raise KeyError(f"compare column {c!r} missing from one side")
    reserved = {"__in_old", "__in_new", "__diff", "status", "changed_cols", "n_changed"}
    clash = reserved & set(keys + compare_cols)
    if clash:
        raise ValueError(f"key/compare columns collide with reserved names: {sorted(clash)}")

    o = old.select(
        *keys,
        F.lit(1).alias("__in_old"),
        *[F.col(c).alias(f"__old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(1).alias("__in_new"),
        *[F.col(c).alias(f"__new_{c}") for c in compare_cols],
    )
    joined = o.join(n, keys, "full_outer")

    # null-safe per-column difference; name emitted only when it differs
    diff_names = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__old_{c}").eqNullSafe(F.col(f"__new_{c}")),
                    F.lit(c),
                )
                for c in compare_cols
            ]
        )
    ) if compare_cols else F.array().cast("array<string>")

    status = (
        F.when(F.col("__in_old").isNull(), F.lit(_STATUS_ADDED))
        .when(F.col("__in_new").isNull(), F.lit(_STATUS_REMOVED))
        .when(F.size("__diff") > 0, F.lit(_STATUS_CHANGED))
        .otherwise(F.lit(_STATUS_UNCHANGED))
    )
    return (
        joined.withColumn("__diff", diff_names)
        .select(
            *keys,
            status.alias("status"),
            F.when(
                F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull(),
                F.concat_ws(",", F.col("__diff")),
            )
            .otherwise(F.lit(""))
            .alias("changed_cols"),
            F.when(
                F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull(),
                F.size("__diff"),
            )
            .otherwise(F.lit(0))
            .alias("n_changed"),
        )
    )


def scd2_intervals(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tracked_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse a change log into SCD2 validity intervals per key.

    From a stream of observations (one row per key per observation time),
    emit one row per *run* of identical tracked values:
    ``(keys..., tracked..., valid_from, valid_to, is_current)`` with
    half-open validity ``[valid_from, valid_to)`` and ``valid_to`` NULL on
    the open current interval — the standard slowly-changing-dimension
    type-2 build every warehouse maintains from CDC feeds.

    Plan shape: ONE shuffle. Everything runs inside a single window
    partitioning on ``keys`` ordered by (``order_col``, tiebreaks): a
    null-safe lag marks run starts, non-starts are filtered out, and
    ``lead`` on the surviving rows supplies each interval's end — no
    groupBy, no second exchange, no self-join. Rows between change
    points never leave their executor. At 100 TB the only scale hazard
    is key skew (one window task per key-partition); keys here are
    real entity ids (users, devices), so cardinality is high and AQE
    handles stragglers.

    ``tiebreak_cols`` (default: none) deterministically orders
    simultaneous observations — REQUIRED for a stable result when
    ``order_col`` can tie within a key.
    """
    if not keys or not tracked_cols:
        raise ValueError("keys and tracked_cols must be non-empty")
    reserved = {"__chg", "valid_from", "valid_to", "is_current"}
    clash = reserved & set(keys + tracked_cols + [order_col])
    if clash:
        raise ValueError(f"input columns collide with reserved names: {sorted(clash)}")

    order = [F.col(order_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    is_start = F.lit(False)
    for c in tracked_cols:
        is_start = is_start | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    # lag over an empty frame is NULL for the first row of each key, so
    # every eqNullSafe above is False there unless the value itself is
    # NULL; force the first row to always open an interval.
    is_start = is_start | F.row_number().over(w).eqNullSafe(F.lit(1))

    starts = df.withColumn("__chg", is_start).filter("__chg")
    return starts.select(
        *keys,
        *tracked_cols,
        F.col(order_col).alias("valid_from"),
        F.lead(order_col).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


class StreamingScd2:
    """Maintain an SCD2 interval table incrementally from a change
    stream: the dimension-maintenance loop every CDC-fed warehouse runs,
    as a ``foreachBatch`` function.

    Merge rule: only keys PRESENT IN THE BATCH are recomputed — the
    stored intervals for a touched key collapse back to their change
    points (``valid_from``, tracked values — which is exactly the
    information :func:`scd2_intervals` kept), union the batch's new
    observations, and re-run the run-collapse; untouched keys pass
    through unchanged. Because adjacent stored change points always
    differ in tracked values, re-collapsing stored points alone is the
    identity — the merge is idempotent, and a replayed batch (which
    re-reads the same pre-batch version) leaves the same state.

    Exactness contract: equal to the batch ``scd2_intervals`` over all
    rows seen, PROVIDED each key's observations arrive in event order
    across batches (CDC commit order — the normal case). A LATE
    observation landing between two stored change points updates the
    interval it falls in, but cannot resurrect an observation that was
    collapsed away as a non-change — the standard SCD2-maintenance
    boundary; keep the raw log if full out-of-order rebuilds matter.

    The state backend is ``sources/versioned.VersionedStore`` (batch B
    reads the newest version < B and overwrites ``v{B}``; replays
    converge). Per batch the recompute cost is (touched keys' intervals
    + the batch), never history; the untouched-side rewrite is an
    anti-join copy — at 100 TB, bucket the store by key hash and use
    dynamic partition overwrite so untouched buckets are not rewritten
    at all.
    """

    def __init__(
        self,
        keys: list[str],
        order_col: str,
        tracked_cols: list[str],
        path: str,
        tiebreak_cols: list[str] | None = None,
        keep_versions: int = 2,
    ) -> None:
        from atiesh_spark.sources.versioned import VersionedStore

        self.keys, self.order_col = keys, order_col
        self.tracked_cols = tracked_cols
        self.tiebreak_cols = tiebreak_cols or []
        self.store = VersionedStore(path, keep_versions=keep_versions)

    def latest_path(self, spark, before: int | None = None) -> str | None:
        return self.store.latest_path(spark, before=before)

    def read(self, spark) -> DataFrame:
        return self.store.read(spark)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        obs_cols = (
            self.keys + self.tracked_cols + [self.order_col] + self.tiebreak_cols
        )
        batch_obs = batch_df.select(*obs_cols)
        store = self.store.read_before(spark, batch_id)
        if store is None:
            merged = scd2_intervals(
                batch_obs, self.keys, self.order_col, self.tracked_cols,
                tiebreak_cols=self.tiebreak_cols or None,
            )
        else:
            batch_keys = batch_obs.select(*self.keys).distinct()
            untouched = store.join(F.broadcast(batch_keys), self.keys, "left_anti")
            touched_points = (
                store.join(F.broadcast(batch_keys), self.keys, "left_semi")
                .select(
                    *self.keys,
                    *self.tracked_cols,
                    F.col("valid_from").alias(self.order_col),
                    # stored change points sort before same-instant batch
                    # rows on the tiebreaks' NULLS FIRST default, keeping
                    # re-collapse stable under exact replays
                    *[F.lit(None).alias(c) for c in self.tiebreak_cols],
                )
            )
            recomputed = scd2_intervals(
                touched_points.unionByName(batch_obs),
                self.keys, self.order_col, self.tracked_cols,
                tiebreak_cols=self.tiebreak_cols or None,
            )
            merged = untouched.unionByName(recomputed)
        self.store.write(merged, batch_id)
