"""Unit tests for PII redaction and the LSH-bucketed k-NN join."""

from __future__ import annotations

from pyspark.sql import functions as F

from atiesh_spark.operators.similarity import knn_join
from atiesh_spark.operators.textstats import pii_counts, redact_pii


def test_redact_pii_all_kinds(spark):
    df = spark.createDataFrame(
        [
            ("mail bob.smith+x@corp.example.org end",),
            ("ip 192.168.0.1 and phone 555-123-4567",),
            ("ssn 123-45-6789 stays typed",),
            ("clean text unchanged",),
        ],
        "t string",
    )
    out = [r[0] for r in df.select(redact_pii("t")).collect()]
    assert out == [
        "mail <EMAIL> end",
        "ip <IP> and phone <PHONE>",
        "ssn <SSN> stays typed",
        "clean text unchanged",
    ]


def test_redact_pii_kind_subset_and_counts(spark):
    df = spark.createDataFrame([("a@b.io 1.2.3.4 c@d.io",)], "t string")
    row = df.select(
        redact_pii("t", kinds=["email"]).alias("r"),
        *[c.alias(k) for k, c in pii_counts("t", kinds=["email", "ipv4"]).items()],
    ).first()
    assert row["r"] == "<EMAIL> 1.2.3.4 <EMAIL>"  # ipv4 untouched
    assert row["email"] == 2 and row["ipv4"] == 1


def test_knn_join_rank_and_no_self_match(spark):
    # two orthogonal-ish groups; vectors in a group are mutual neighbors
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.8, 0.2, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = knn_join(emb, k=2, num_planes=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["id_1"], []).append(r)
    for q, neigh in by_q.items():
        assert all(r["id_2"] != q for r in neigh)          # no self match
        ranks = sorted(r["rank"] for r in neigh)
        assert ranks == list(range(1, len(ranks) + 1))     # dense 1..n
        sims = [r["sim"] for r in sorted(neigh, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)          # rank follows sim
    # the colinear trio must find each other if bucketed together
    if 0 in by_q and 1 in by_q:
        assert {r["id_2"] for r in by_q[0]} <= {1, 2, 3}
