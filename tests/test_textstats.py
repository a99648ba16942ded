"""Unit tests for text-statistics operators (char entropy)."""

from __future__ import annotations


def test_char_entropy_values_and_degenerate_inputs(spark):
    import math

    from atiesh_spark.operators.textstats import char_entropy

    df = spark.createDataFrame(
        [(1, "aabbc"), (2, "aaaa"), (3, ""), (4, None), (5, "ab")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    want = -sum(p * math.log2(p) for p in (0.4, 0.4, 0.2))
    assert out[1]["char_entropy"] == round(want, 4) and out[1]["n_chars_seen"] == 5
    assert out[2]["char_entropy"] == 0.0  # single repeated char: zero bits
    assert out[3]["char_entropy"] == 0.0 and out[3]["n_chars_seen"] == 0
    assert out[4]["char_entropy"] == 0.0 and out[4]["n_chars_seen"] == 0
    assert out[5]["char_entropy"] == 1.0  # two equiprobable chars: one bit
