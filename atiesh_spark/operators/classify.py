"""In-engine text classification: multinomial Naive Bayes train +
predict over whitespace tokens.

The model-based filter step of a curation pipeline — GPT-3-style
"quality classifier" gates, language-ID refinement, source attribution
— trained INSIDE the engine so the 100 TB corpus never leaves it
(classic NB is the one text classifier whose sufficient statistics are
a pair of counting aggregations, which is why every large-scale
pipeline has one even when a neural scorer follows).

Scale design:

- ``nb_train``: sufficient statistics only — ONE (label, token)
  shuffle for likelihood counts and a label-sized doc-count aggregate
  for priors. Model size is |observed (label, token) pairs| — the
  vocab dim — plus a class-count row; both orders of magnitude below
  corpus size, and ``min_count`` Zipf-truncates the tail.
- ``nb_predict``: the model ships as a BROADCAST token dim (token ->
  per-class log-likelihood array, dense across classes so zero-count
  classes and out-of-vocab tokens take the same smoothed default with
  no special cases at score time). Scoring is: explode test tokens,
  broadcast-join the dim, posexplode the class axis, one map-side-
  combined (doc, class) sum — the corpus-side stream shuffles once,
  by doc, and the argmax is a per-doc max over C structs. Empty and
  all-OOV docs still classify: every doc emits its C prior rows into
  the same aggregate the token contributions feed, so no-token docs
  score prior-only with no join or special case.

Laplace smoothing with ``smoothing`` (default 1.0):
    P(t | c) = (count(t, c) + s) / (total_c + s * (V + 1))
with V = training vocabulary size; the "+1" reserves one slot for
unseen tokens so OOV probability mass is well-defined (the standard
open-vocabulary convention, same shape as textstats.ngram_lm_scores).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _toks(text_col: str) -> Column:
    from atiesh_spark.functions.text import ws_tokens

    return ws_tokens(text_col)


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
    num_bins: int | None = None,
) -> DataFrame:
    """Decision-threshold calibration sweep for a binary scorer.

    One row per candidate threshold ``t`` (predict positive when
    ``score >= t``): ``(threshold, n_pred, tp, prec, rec, f1, auc)``
    with ``auc`` the exact Mann-Whitney rank AUC (ties get average
    ranks), constant across rows. This is the step that turns a scorer
    (q111's Naive Bayes, q94's LM perplexity, a neural quality model)
    into a FILTER: pick the operating point from the sweep instead of
    guessing a cutoff.

    Scale design: the corpus-sized work is ONE map-side-combined
    ``groupBy(score)`` — every cumulative quantity then lives on the
    grouped frame, whose size is the number of DISTINCT thresholds.
    The cumulative windows are unpartitioned (a single sorted task),
    which is exactly right AFTER the aggregation: pass ``num_bins`` to
    quantize scores onto a uniform grid first (one min/max aggregate
    broadcast back, threshold = bin left edge) so the sweep frame is
    bounded at ``num_bins`` rows no matter the corpus — the same
    pre-aggregate-then-window shape as ``profile.histogram``. With
    ``num_bins=None`` every distinct score is a candidate threshold
    (exact; fine when scores are discrete or the frame is small).

    AUC uses average ascending ranks: for a tie group of size ``n``
    preceded by ``c`` rows, ``avg_rank = c + (n + 1) / 2``; then
    ``AUC = (sum_pos(avg_rank) - P(P+1)/2) / (P * N)``. All terms are
    exact multiples of 0.5 far below 2^53, so the sum is
    order-independent and the result engine-deterministic. ``auc`` is
    NULL when either class is absent (undefined). ``f1`` is computed
    as ``2*tp / (n_pred + P)`` — the tie-free single-division form.
    NULL scores and NULL labels are excluded (no decision, no truth).
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(score_col).cast("double").alias("__s"),
        F.col(label_col).cast("int").alias("__pos"),
    ).filter(F.col("__s").isNotNull() & F.col("__pos").isNotNull())
    if num_bins is not None:
        if num_bins < 1:
            raise ValueError("num_bins must be >= 1")
        bounds = base.agg(F.min("__s").alias("__lo"), F.max("__s").alias("__hi"))
        width = (F.col("__hi") - F.col("__lo")) / F.lit(float(num_bins))
        bin_idx = F.least(
            F.floor((F.col("__s") - F.col("__lo")) / width),
            F.lit(num_bins - 1),
        )
        base = base.crossJoin(F.broadcast(bounds)).select(
            F.when(F.col("__hi") == F.col("__lo"), F.col("__lo"))
            .otherwise(F.col("__lo") + bin_idx * width)
            .alias("__s"),
            "__pos",
        )
    g = base.groupBy(F.col("__s").alias("threshold")).agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__pos").alias("__np")
    )
    w_desc = Window.orderBy(F.col("threshold").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_before = Window.orderBy("threshold").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy()
    swept = g.select(
        "threshold",
        "__np",
        F.sum("__n").over(w_desc).alias("n_pred"),
        F.sum("__np").over(w_desc).alias("tp"),
        (
            F.coalesce(F.sum("__n").over(w_before), F.lit(0))
            + (F.col("__n") + 1) / 2.0
        ).alias("__avg_rank"),
        F.sum("__n").over(w_all).alias("__n_all"),
        F.sum("__np").over(w_all).alias("__p_all"),
    )
    totals = swept.select(
        "threshold",
        "n_pred",
        "tp",
        "__p_all",
        "__n_all",
        F.sum(F.col("__np") * F.col("__avg_rank")).over(w_all).alias("__rank_pos"),
    )
    neg = F.col("__n_all") - F.col("__p_all")
    return totals.select(
        "threshold",
        "n_pred",
        "tp",
        (F.col("tp") / F.col("n_pred")).alias("prec"),
        (F.col("tp") / F.col("__p_all")).alias("rec"),
        (2.0 * F.col("tp") / (F.col("n_pred") + F.col("__p_all"))).alias("f1"),
        F.when(
            (F.col("__p_all") > 0) & (neg > 0),
            (
                F.col("__rank_pos")
                - F.col("__p_all") * (F.col("__p_all") + 1) / 2.0
            )
            / (F.col("__p_all") * neg),
        ).alias("auc"),
    )


def nb_train(
    docs: DataFrame,
    label_col: str,
    text_col: str,
    smoothing: float = 1.0,
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Fit the model; returns ``(classes, token_dim)`` — both lazy.

    ``classes``: one row per label, ordered fields for deterministic
    class indexing: (label, class_idx, n_docs, n_tokens, log_prior,
    log_default) — ``class_idx`` is the rank of the label in sorted
    order; ``log_default`` is the smoothed log-likelihood of any token
    with zero count in that class (OOV included).

    ``token_dim``: (token, llk) with ``llk`` a DOUBLE array indexed by
    ``class_idx`` — dense across classes, so predict needs no
    per-class special-casing. NULL labels are excluded (an unlabeled
    doc can't teach the classifier anything).
    """
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0")
    from atiesh_spark.operators.dedup import _fanout

    labeled = docs.filter(F.col(label_col).isNotNull())
    toks = _fanout(labeled.select(label_col, text_col)).select(
        F.col(label_col).alias("__label"), F.explode(_toks(text_col)).alias("__t")
    )
    counts = toks.groupBy("__label", "__t").agg(F.count(F.lit(1)).alias("__n"))
    if min_count > 1:
        counts = counts.filter(F.col("__n") >= min_count)
    # The sufficient statistics ARE the training result: checkpoint them
    # so the one corpus-scale shuffle runs once, not once per consumer
    # (vocab size, class totals, and the token dim all read this frame).
    counts = counts.localCheckpoint()
    vocab = counts.agg(F.countDistinct("__t").alias("__v"))
    class_tokens = counts.groupBy("__label").agg(F.sum("__n").alias("__ct"))
    class_docs = labeled.groupBy(F.col(label_col).alias("__label")).agg(
        F.count(F.lit(1)).alias("__nd")
    )
    total_docs = class_docs.agg(F.sum("__nd").alias("__td"))

    from pyspark.sql import Window

    w = Window.orderBy("__label")  # tiny frame: one row per class
    classes = (
        class_docs.join(F.broadcast(class_tokens), "__label", "left")
        .crossJoin(F.broadcast(total_docs))
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col("__label").alias("label"),
            (F.row_number().over(w) - 1).alias("class_idx"),
            F.col("__nd").alias("n_docs"),
            F.coalesce(F.col("__ct"), F.lit(0)).alias("n_tokens"),
            F.log(F.col("__nd") / F.col("__td")).alias("log_prior"),
            F.log(
                F.lit(smoothing)
                / (
                    F.coalesce(F.col("__ct"), F.lit(0))
                    + smoothing * (F.col("__v") + 1)
                )
            ).alias("log_default"),
        )
    )
    # One row per label: materialize. The frame is consumed three
    # times (token_dim's class axis, predict's prior/default axis,
    # predict's label dim) and each broadcast build otherwise re-runs
    # the whole class-statistics subtree — the q111 plan carried 40
    # parquet scans of the same corpus before this.
    classes = classes.localCheckpoint()
    # Dense per-token class vector: map of observed counts + the class
    # axis from a broadcast one-row array of (idx, total, default).
    class_arr = classes.agg(
        F.sort_array(
            F.collect_list(
                F.struct("class_idx", "label", "n_tokens", "log_default")
            )
        ).alias("__cls")
    )
    per_token = counts.groupBy(F.col("__t").alias("token")).agg(
        F.map_from_entries(
            F.collect_list(F.struct("__label", "__n"))
        ).alias("__by_label")
    )
    token_dim = (
        per_token.crossJoin(F.broadcast(class_arr))
        .crossJoin(F.broadcast(vocab))
        .select(
            "token",
            F.transform(
                F.col("__cls"),
                lambda c: F.log(
                    (
                        F.coalesce(
                            F.element_at(F.col("__by_label"), c["label"]),
                            F.lit(0),
                        )
                        + smoothing
                    )
                    / (c["n_tokens"] + smoothing * (F.col("__v") + 1))
                ),
            ).alias("llk"),
        )
    )
    return classes, token_dim


def nb_predict(
    docs: DataFrame,
    classes: DataFrame,
    token_dim: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Classify every document: (id_col, pred_label, log_score).

    Scores are rounded BEFORE the argmax and ties break toward the
    smallest class_idx (= lexicographically first label), so the
    prediction is engine-deterministic. Docs with no tokens (or only
    OOV tokens) still classify via priors (+ defaults).
    """
    class_arr = classes.agg(
        F.sort_array(
            F.collect_list(F.struct("class_idx", "label", "log_prior", "log_default"))
        ).alias("__cls")
    )
    from atiesh_spark.operators.dedup import _fanout

    base = _fanout(docs.select(id_col, text_col))
    toks = base.select(F.col(id_col), F.explode(_toks(text_col)).alias("token"))
    # Prior rows and token contributions UNION into one (doc, class)
    # aggregate — the only shuffle, map-side combined — instead of a
    # doc x C join between a prior frame and a contribution frame
    # (which would co-shuffle two corpus-sized frames for nothing).
    prior_rows = base.crossJoin(F.broadcast(class_arr)).select(
        F.col(id_col),
        F.posexplode(
            F.transform(F.col("__cls"), lambda c: c["log_prior"])
        ).alias("class_idx", "__llk"),
    )
    tok_rows = (
        toks.join(F.broadcast(token_dim), "token", "left")
        .crossJoin(F.broadcast(class_arr))
        .select(
            F.col(id_col),
            F.posexplode(
                F.coalesce(
                    F.col("llk"),
                    F.transform(F.col("__cls"), lambda c: c["log_default"]),
                )
            ).alias("class_idx", "__llk"),
        )
    )
    scores = (
        prior_rows.unionByName(tok_rows)
        .groupBy(id_col, "class_idx")
        .agg(F.round(F.sum("__llk"), round_to).alias("__score"))
    )
    # argmax over a struct of (double, int) ONLY: max(struct) always
    # plans a SortAggregate (struct buffers are not hash-aggregatable)
    # — accepted in the registry triage because the input is already
    # the hash-reduced (doc, class) frame — but carrying the label
    # string inside the buffer also dragged it through the sort and
    # the partial-agg state. Keep the sorted rows fixed-width and
    # attach the label after the reduction via the broadcast class dim.
    best = (
        scores.groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("__score").alias("s"),
                    (-F.col("class_idx")).alias("neg_idx"),
                )
            ).alias("__best")
        )
        .join(
            F.broadcast(
                classes.select("class_idx", F.col("label").alias("__label"))
            ),
            F.col("class_idx") == -F.col("__best.neg_idx"),
        )
    )
    return best.select(
        F.col(id_col),
        F.col("__label").alias("pred_label"),
        F.col("__best.s").alias("log_score"),
    )


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 10,
    lr: float = 0.5,
    l2: float = 0.0,
) -> dict[str, float]:
    """In-engine logistic regression by full-batch gradient descent —
    the step past Naive Bayes (``nb_train``) toward the
    fastText/DCLM-style learned quality gate, still without the corpus
    ever leaving the engine.

    Each of the ``iters`` rounds computes the exact batch gradient as
    ONE map-side-combined aggregate over the data —
    ``grad_j = sum((sigmoid(w.x + b) - y) * x_j)`` built from codegen
    expressions with the current weights inlined as d+1 scalar
    literals (a handful of doubles, nowhere near the Catalyst
    literal-tree hazard) — then applies the deterministic update
    ``w -= lr * (grad / n + l2 * w)`` driver-side. Driver traffic is
    exactly d+1 doubles per round: the k-means digest discipline.

    Returns ``{"b": ..., feature: weight, ..., "n": n, "loss": ...}``
    where ``loss`` is the final mean log-loss (computed AFTER the last
    update, one extra pass). Deterministic given the data: no
    sampling, no initialization randomness (weights start at 0, where
    the loss is convex anyway). NULL labels or features raise — a
    training gate must not silently skip rows (filter first; the
    explicit contract mirrors nb_train).

    Feature scaling is the caller's job (unscaled features with a
    shared ``lr`` converge badly — standardize or bound them first);
    keeping it out of the trainer keeps the gradient exactly
    reproducible by an external oracle with no mean/std round-trip.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not feature_cols:
        raise ValueError("need at least one feature column")
    # Materialize the PROJECTED features once: the training loop makes
    # iters + 3 passes (null gate, count, per-round gradients, loss),
    # and without this every pass re-ran the full upstream plan — for a
    # text-derived feature that is iters + 3 corpus scans recomputing
    # the same expressions (measured 13 scans at q167's sf0.1 cell).
    # localCheckpoint preserves the upstream partition layout, so
    # per-partition summation order — and therefore every learned
    # weight — is bit-identical to the unmaterialized plan.
    df = df.select(label_col, *feature_cols).localCheckpoint()
    null_cond = F.col(label_col).isNull()
    for c in feature_cols:
        null_cond = null_cond | F.col(c).isNull()
    # one pass for both admission checks instead of two driver round
    # trips (the loop is job-count-bound once features are materialized)
    gate = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.when(null_cond, 1).otherwise(0)).alias("__nulls"),
    ).first()
    if (gate["__nulls"] or 0) > 0:
        raise ValueError(
            "NULL labels or features present — filter or impute before "
            "training"
        )
    n = gate["__n"]
    if n == 0:
        raise ValueError("empty training frame")
    d = len(feature_cols)
    w = [0.0] * d
    b = 0.0
    y = F.col(label_col).cast("double")

    def z_expr() -> Column:
        z = F.lit(b)
        for j, c in enumerate(feature_cols):
            z = z + F.lit(w[j]) * F.col(c).cast("double")
        return z

    for _ in range(iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z_expr()))
        r = (p - y).alias("__r")
        aggs = [F.sum(F.col("__r")).alias("__gb")] + [
            F.sum(F.col("__r") * F.col(c).cast("double")).alias(f"__g{j}")
            for j, c in enumerate(feature_cols)
        ]
        row = df.select(r, *feature_cols).agg(*aggs).collect()[0]
        b -= lr * row["__gb"] / n
        w = [
            w[j] - lr * (row[f"__g{j}"] / n + l2 * w[j])
            for j in range(d)
        ]
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z_expr()))
    eps = 1e-12
    loss_col = -(
        y * F.log(F.greatest(p, F.lit(eps)))
        + (1 - y) * F.log(F.greatest(1 - p, F.lit(eps)))
    )
    loss = df.select(F.avg(loss_col).alias("__l")).collect()[0]["__l"]
    out = {"b": b, "n": float(n), "loss": loss}
    for j, c in enumerate(feature_cols):
        out[c] = w[j]
    return out


def logreg_score(
    df: DataFrame,
    model: dict[str, float],
    feature_cols: list[str],
    out_col: str = "p",
) -> DataFrame:
    """Score rows with a ``logreg_train`` model: adds ``out_col`` =
    sigmoid(w.x + b). Pure codegen — d multiplies and one exp per row,
    zero shuffles, zero Python."""
    z = F.lit(model["b"])
    for c in feature_cols:
        z = z + F.lit(model[c]) * F.col(c).cast("double")
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def hashed_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int = 8,
) -> DataFrame:
    """The hashing trick (Weinberger et al., ICML 2009): bag-of-words
    reduced to a FIXED feature width with no vocabulary pass — each
    whitespace token md5-hashes to one of ``num_buckets`` buckets, and
    the features are bucket counts normalized by token count. The
    vectorizer the fastText-style quality gate actually uses: no vocab
    state to ship or version, identical features on any engine that
    can md5.

    Returns (id, n_tokens, f0..f{num_buckets-1}) with ``fj`` =
    bucket-j count / n_tokens (0.0 for empty docs — a defined neutral
    vector, so downstream trainers need no NULL handling). One explode
    + ONE map-side-combined aggregate (conditional sums per bucket, no
    pivot machinery, no second shuffle); the feature columns plug
    straight into ``logreg_train``.
    """
    if num_buckets < 2:
        raise ValueError("num_buckets must be >= 2")
    from atiesh_spark.functions.hashing import md5_long
    from atiesh_spark.operators.dedup import _fanout

    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0
    )
    exploded = (
        _fanout(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), F.explode_outer(toks).alias("__t"))
        .select(
            F.col(id_col),
            F.when(
                F.col("__t").isNotNull(), md5_long(F.col("__t")) % num_buckets
            ).alias("__b"),
        )
    )
    aggs = [
        F.sum(F.when(F.col("__b").isNotNull(), 1).otherwise(0)).alias("n_tokens")
    ] + [
        F.sum((F.col("__b") == j).cast("long")).alias(f"__c{j}")
        for j in range(num_buckets)
    ]
    counted = exploded.groupBy(id_col).agg(*aggs)
    return counted.select(
        F.col(id_col),
        F.col("n_tokens"),
        *[
            F.when(
                F.col("n_tokens") > 0, F.col(f"__c{j}") / F.col("n_tokens")
            )
            .otherwise(0.0)
            .alias(f"f{j}")
            for j in range(num_buckets)
        ],
    )


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram + expected calibration error for a binary
    scorer (Guo et al., "On Calibration of Modern Neural Networks",
    ICML 2017 — the binned-ECE formulation): a quality GATE's scores
    are only as useful as their calibration (a 0.9 that is right 60%
    of the time mis-prices every downstream budget decision).

    One row per score bin (equal-width over [0, 1]): ``bin``,
    ``lo_edge``, ``n``, ``avg_score``, ``avg_label`` (the observed
    positive rate), ``gap`` = |avg_score - avg_label|, plus the
    corpus-level ``ece`` = sum(n/N * gap) repeated per row (a report
    frame, q168-style). Scores must already be probabilities in
    [0, 1] — rows outside are a caller bug and raise via an in-plan
    check; NULL scores/labels are excluded (no decision, no truth).
    Empty bins are absent (their ECE term is zero anyway).

    Engine shape: ONE map-side-combined groupBy on the bin index
    (CASE-chain comparisons on the raw double — no multiply-then-
    floor, whose last-ulp behavior engines may disagree on at bin
    edges) + one scalar window for the ECE total.
    """
    if bins < 2:
        raise ValueError("bins must be >= 2")
    from pyspark.sql.window import Window

    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.select(s.alias("__s"), y.alias("__y")).filter(
        F.col("__s").isNotNull() & F.col("__y").isNotNull()
    )
    oob = base.filter((F.col("__s") < 0) | (F.col("__s") > 1)).limit(1).count()
    if oob:
        raise ValueError("scores must be probabilities in [0, 1]")
    # CASE-chain binning: bin b covers [b/bins, (b+1)/bins), last bin
    # closed at 1.0; comparisons, not arithmetic, so engines agree
    bin_expr = F.lit(bins - 1)
    for b in range(bins - 1, 0, -1):
        bin_expr = F.when(F.col("__s") < b / bins, b - 1).otherwise(bin_expr)
    g = (
        base.withColumn("__b", bin_expr)
        .groupBy("__b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("__s").alias("__as"),
            F.avg("__y").alias("__ay"),
        )
    )
    w = Window.partitionBy()
    return (
        g.withColumn("__N", F.sum("n").over(w))
        .withColumn(
            "__ece",
            F.sum(F.col("n") * F.abs(F.col("__as") - F.col("__ay"))).over(w)
            / F.col("__N"),
        )
        .select(
            F.col("__b").cast("int").alias("bin"),
            F.round(F.col("__b") / bins, 4).alias("lo_edge"),
            "n",
            F.round("__as", 4).alias("avg_score"),
            F.round("__ay", 4).alias("avg_label"),
            F.round(F.abs(F.col("__as") - F.col("__ay")), 4).alias("gap"),
            F.round("__ece", 4).alias("ece"),
        )
    )


def temperature_fit(
    df: DataFrame,
    score_col: str,
    label_col: str,
    grid: list[float] | None = None,
    bins: int = 10,
) -> DataFrame:
    """Temperature scaling (Guo et al., ICML 2017) — the one-parameter
    remedy for the miscalibration ``calibration_report`` measures:
    divide the logits by T and pick the T minimizing NLL. The fit is
    a FIXED deterministic grid search (default T = 0.2 .. 5.0 step
    0.2), not a line search with float-path-dependent stopping — an
    external oracle can replay it exactly, and one temperature is a
    25-point curve, not an optimization problem.

    Returns ONE row: (best_t, nll_uncal, nll_cal, ece_uncal,
    ece_cal) — NLL at T=1 vs T*, and binned ECE before/after (same
    CASE-chain bins as calibration_report). Scores clamp to
    [1e-6, 1 - 1e-6] before the logit so boundary probabilities stay
    finite (documented, mirrored by the oracle). Ties on NLL take the
    smallest T.

    Engine shape: ONE aggregate computes the whole NLL curve (|grid|
    sum expressions over one scan); the argmin is a |grid|-double
    driver digest; the calibrated ECE is one more binned aggregate.
    """
    if bins < 2:
        raise ValueError("bins must be >= 2")
    grid = grid or [round((i + 1) / 5, 1) for i in range(25)]
    if not grid or any(t <= 0 for t in grid):
        raise ValueError("grid temperatures must be positive")
    eps = 1e-6
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.select(s.alias("__s"), y.alias("__y")).filter(
        F.col("__s").isNotNull() & F.col("__y").isNotNull()
    )
    clamped = F.least(F.greatest(F.col("__s"), F.lit(eps)), F.lit(1 - eps))
    z = F.log(clamped / (1 - clamped))
    work = base.select("__y", z.alias("__z"))

    def nll_at(t: float):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__z") / t))
        return F.avg(
            -(
                F.col("__y") * F.log(F.greatest(p, F.lit(1e-12)))
                + (1 - F.col("__y")) * F.log(F.greatest(1 - p, F.lit(1e-12)))
            )
        )

    curve = work.agg(
        *[nll_at(t).alias(f"__nll_{i}") for i, t in enumerate(grid)]
    ).collect()[0]
    nlls = [(float(curve[f"__nll_{i}"]), grid[i]) for i in range(len(grid))]
    best_t = min(nlls, key=lambda p: (p[0], p[1]))[1]
    nll_uncal = next(v for v, t in nlls if t == 1.0) if 1.0 in grid else None
    nll_cal = next(v for v, t in nlls if t == best_t)

    def ece_of(scored: DataFrame, col: str) -> DataFrame:
        return calibration_report(scored, col, "__y", bins=bins).select(
            "ece"
        ).limit(1)

    cal_p = (F.lit(1.0) / (F.lit(1.0) + F.exp(-z / best_t))).alias("__pc")
    both = base.select("__y", clamped.alias("__pu"), cal_p)
    e_un = ece_of(both, "__pu").collect()[0]["ece"]
    e_ca = ece_of(both, "__pc").collect()[0]["ece"]
    spark = df.sparkSession
    if nll_uncal is None:
        nll_uncal = float(
            work.agg(nll_at(1.0).alias("x")).collect()[0]["x"]
        )
    return spark.createDataFrame(
        [(
            float(best_t), round(nll_uncal, 4), round(nll_cal, 4),
            e_un, e_ca,
        )],
        "best_t double, nll_uncal double, nll_cal double, "
        "ece_uncal double, ece_cal double",
    )
