"""Event-sequence assembly: gaps-and-islands sessionization and ordered
per-session payload concatenation — how interaction logs become
training sequences (chat turns, clickstreams, agent trajectories).

The relational complement of the streaming session window (q37) and the
session funnel (q50): those COUNT sessions; this module materializes
the ordered sequence itself, the artifact a sequence-model pipeline
trains on.

Scale shape: sessionization is ONE per-key window shuffle (lag + a
running sum of gap flags — the classic gaps-and-islands rewrite, no
self-join); assembly is one groupBy whose per-group state is the
session's own events (sessions are bounded by construction — a key's
events split at every ``gap_seconds`` silence), sorted executor-side
with ``array_sort`` over (ts, tiebreak, payload) structs, so ordering
never depends on shuffle arrival order. No driver-side collection at
any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Append ``session_col``: 0-based session index per key, a new
    session starting at every gap > ``gap_seconds`` since the previous
    event (gaps-and-islands: lag + running sum, one window shuffle).
    ``tiebreak_col`` deterministically orders same-timestamp events —
    pass it whenever ``ts_col`` can tie, or session boundaries at ties
    become arrival-order dependent."""
    if gap_seconds <= 0:
        raise ValueError("gap_seconds must be positive")
    if session_col in df.columns:
        raise ValueError(f"{session_col!r} collides with an input column")
    # exact integer epoch micros: NTZ through the tz-independent
    # wall-clock diff (the timeseries.py convention), LTZ through the
    # instant — a double cast would be NTZ-illegal and float-lossy
    from atiesh_spark.operators.timeseries import epoch_micros

    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        us = epoch_micros(ts_col)
    else:
        us = F.unix_micros(F.col(ts_col))
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(us).over(w)
    new_session = (
        prev.isNull() | (us - prev > F.lit(gap_seconds * 1_000_000))
    ).cast("long")
    return df.withColumn(
        session_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def assemble_sequences(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    payload_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
    sep: str = "|",
    session_col: str = "session_id",
) -> DataFrame:
    """Materialize one training sequence per (key, session):
    (key_col, session_col, session_start, n_events, sequence) where
    ``sequence`` is the payloads joined by ``sep`` in (ts, tiebreak,
    payload) order — the deterministic sort happens executor-side via
    ``array_sort`` over structs, never relying on collect_list arrival
    order. NULL payloads are dropped from the sequence (and from
    ``n_events``): a row with nothing to say contributes nothing.
    """
    s = sessionize(
        df.select(key_col, ts_col, payload_col)
        if tiebreak_col is None
        else df.select(key_col, ts_col, tiebreak_col, payload_col),
        key_col,
        ts_col,
        gap_seconds,
        tiebreak_col=tiebreak_col,
        session_col=session_col,
    ).filter(F.col(payload_col).isNotNull())
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    packed = F.struct(
        F.col(ts_col).alias("t"), tb.alias("k"), F.col(payload_col).alias("p")
    )
    return (
        s.groupBy(key_col, session_col)
        .agg(
            F.min(ts_col).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.array_sort(F.collect_list(packed)).alias("__seq"),
        )
        .select(
            key_col,
            session_col,
            "session_start",
            "n_events",
            F.concat_ws(sep, F.transform("__seq", lambda x: x["p"])).alias(
                "sequence"
            ),
        )
    )


def validate_conversations(
    df: DataFrame,
    conv_col: str,
    role_col: str,
    content_col: str,
    order_cols: list[str],
    roles: tuple[str, str] = ("user", "assistant"),
    min_turns: int = 2,
) -> DataFrame:
    """Instruction-data turn hygiene: one row per conversation with the
    structural facts an SFT/RLHF ingest gate filters on.

    A well-formed two-party conversation starts with ``roles[0]``,
    strictly alternates, ends on ``roles[1]``, has no empty turns, and
    has at least ``min_turns`` turns. Output per conversation:

    - ``n_turns``
    - ``first_role`` / ``last_role``
    - ``n_role_breaks`` — turns whose role differs from the strict
      expectation ``roles[(turn_index - 1) % 2]`` (this single counter
      covers wrong first speaker, broken alternation, AND any role
      outside the two-party set — an off-script role never equals the
      expected one)
    - ``n_empty`` — NULL or whitespace-only content
    - ``valid`` — the gate: no breaks, no empties, long enough, ends on
      ``roles[1]``

    Engine shape: ONE per-conversation window shuffle (row_number over
    ``order_cols`` — pass a total order, e.g. [ts, turn_id], so the
    verdict never depends on arrival order), then one groupBy on the
    same key (no second exchange: the window's hash partitioning is
    reused). Content never leaves codegen — only booleans aggregate.
    """
    if min_turns < 1:
        raise ValueError("min_turns must be >= 1")
    if roles[0] == roles[1]:
        raise ValueError("roles must be two distinct speakers")
    w = Window.partitionBy(conv_col).orderBy(*order_cols)
    turns = df.select(
        F.col(conv_col),
        F.col(role_col).alias("__role"),
        F.col(content_col).alias("__content"),
        F.row_number().over(w).alias("__rn"),
    ).select(
        F.col(conv_col),
        "__role",
        "__rn",
        F.when(
            F.col("__rn") % 2 == 1, F.lit(roles[0])
        ).otherwise(F.lit(roles[1])).alias("__expected"),
        (
            F.col("__content").isNull()
            | (F.trim(F.col("__content")) == "")
        ).alias("__empty"),
    )
    agg = turns.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.max(F.when(F.col("__rn") == 1, F.col("__role"))).alias("first_role"),
        F.max_by("__role", "__rn").alias("last_role"),
        F.sum(
            # NULL role is a break too — coalesce, or the comparison's
            # NULL would silently drop out of the sum
            F.coalesce(
                F.col("__role") != F.col("__expected"), F.lit(True)
            ).cast("long")
        ).alias("n_role_breaks"),
        F.sum(F.col("__empty").cast("long")).alias("n_empty"),
    )
    return agg.select(
        F.col(conv_col),
        "n_turns",
        "first_role",
        "last_role",
        "n_role_breaks",
        "n_empty",
        (
            (F.col("n_role_breaks") == 0)
            & (F.col("n_empty") == 0)
            & (F.col("n_turns") >= min_turns)
            & (F.col("last_role") == roles[1])
        ).alias("valid"),
    )


def flatten_tree(
    df: DataFrame,
    id_col: str,
    parent_col: str,
    max_depth: int = 64,
) -> DataFrame:
    """Flatten a parent-pointer hierarchy into root-to-node paths:
    (id_col, root, depth, path) — the thread-ingestion step that turns
    forum/conversation trees into linear sequences an SFT pipeline can
    assemble (roots have depth 0; ``path`` is the '/'-joined id chain
    from the root down to the node).

    Pointer DOUBLING, not per-level iteration: each round every node
    splices its furthest-known ancestor's chain onto its own and
    inherits that ancestor's pointer, so the unresolved depth HALVES —
    ceil(log2(max_depth)) rounds of one self-join each (the
    connected-components discipline, dedup.py), with the narrow
    (id, anc, chain) state localCheckpoint()ed per round so no round
    recomputes its predecessors. A cycle or a deeper-than-max_depth
    chain leaves anc unresolved and raises rather than silently
    truncating.
    """
    import math

    if max_depth < 1:
        raise ValueError("max_depth must be >= 1")
    state = df.select(
        F.col(id_col).alias("id"),
        F.col(parent_col).alias("anc"),
        F.array(F.col(id_col)).alias("chain"),
    ).localCheckpoint()
    for _ in range(max(1, math.ceil(math.log2(max_depth)))):
        anc_side = state.select(
            F.col("id").alias("__aid"),
            F.col("anc").alias("__aanc"),
            F.col("chain").alias("__achain"),
        )
        state = (
            state.join(anc_side, state["anc"] == anc_side["__aid"], "left")
            .select(
                "id",
                # a parent id absent from the table dangles: treat the
                # node as rooted there (splice nothing) rather than
                # NULLing the chain through concat(chain, NULL)
                F.when(
                    F.col("anc").isNotNull()
                    & F.col("__achain").isNotNull(),
                    F.col("__aanc"),
                ).alias("__next_anc"),
                F.when(
                    F.col("anc").isNotNull()
                    & F.col("__achain").isNotNull(),
                    F.concat(F.col("chain"), F.col("__achain")),
                )
                .otherwise(F.col("chain"))
                .alias("chain"),
            )
            .select("id", F.col("__next_anc").alias("anc"), "chain")
            .localCheckpoint()
        )
        if state.filter(F.col("anc").isNotNull()).isEmpty():
            break
    else:
        if not state.filter(F.col("anc").isNotNull()).isEmpty():
            raise ValueError(
                f"unresolved ancestors after max_depth={max_depth} "
                "doubling rounds — cycle or deeper tree than declared"
            )
    return state.select(
        F.col("id").alias(id_col),
        F.element_at("chain", -1).alias("root"),
        (F.size("chain") - 1).cast("bigint").alias("depth"),
        F.array_join(F.reverse("chain"), "/").alias("path"),
    )
