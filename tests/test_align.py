"""Gale-Church alignment (operators/align.py) against the published
model's hand-checkable behaviors."""

import pytest

from atiesh_spark.operators.align import _align_one, gale_church_align


class TestAlignOne:
    def test_equal_lengths_all_one_one(self):
        lens = [30, 45, 22, 38]
        got = _align_one(lens, lens)
        assert got == [(k, k, k, k, "1-1") for k in range(4)]

    def test_merge_detected_at_every_position(self):
        L = [25, 38, 21, 34, 47, 30]
        for m in range(5):
            tgt = (
                [L[j] for j in range(m)]
                + [L[m] + L[m + 1] + 1]
                + [L[j] for j in range(m + 2, 6)]
            )
            got = _align_one(L, tgt)
            assert got[m][4] == "2-1", (m, got)
            assert sum(1 for b in got if b[4] == "2-1") == 1

    def test_split_is_one_two(self):
        # target splits source sentence 1 into two halves
        src = [30, 61, 28]
        tgt = [30, 30, 30, 28]
        got = _align_one(src, tgt)
        assert got[1][4] == "1-2"
        assert got[1][:4] == (1, 1, 1, 2)

    def test_unmatched_sentence_absorbs_into_merge(self):
        # Known Gale-Church behavior: a source sentence with no target
        # counterpart is absorbed into a 2-1 bead rather than deleted —
        # the deletion bead pays both a tiny prior (0.0099) and the full
        # l2=0 length penalty, so 1-0 only wins when no alternative
        # exists (see test_empty_sides).
        src = [30, 40, 30]
        tgt = [30, 30]
        got = _align_one(src, tgt)
        assert got == [(0, 0, 0, 0, "1-1"), (1, 2, 1, 1, "2-1")]

    def test_empty_sides(self):
        assert _align_one([10, 10], []) == [
            (0, 0, -1, -1, "1-0"), (1, 1, -1, -1, "1-0")
        ]
        assert _align_one([], [10]) == [(-1, -1, 0, 0, "0-1")]


class TestGaleChurchAlign:
    def test_spark_matches_local_dp(self, spark):
        L = [25, 38, 21, 34, 47, 30]
        tgt = [25, 38, 21 + 34 + 1, 47, 30]
        df = spark.createDataFrame(
            [(7, ["a" * x for x in L], ["b" * x for x in tgt])],
            "pair_id long, src array<string>, tgt array<string>",
        )
        got = [
            (r["src_lo"], r["src_hi"], r["tgt_lo"], r["tgt_hi"], r["bead"])
            for r in gale_church_align(df, "pair_id", "src", "tgt")
            .orderBy("k").collect()
        ]
        assert got == _align_one(L, tgt)

    def test_null_and_empty_rows_skipped(self, spark):
        df = spark.createDataFrame(
            [(1, ["aaa"], ["bbb"]), (2, None, None), (3, [], [])],
            "pair_id long, src array<string>, tgt array<string>",
        )
        out = gale_church_align(df, "pair_id", "src", "tgt").collect()
        assert {r["pair_id"] for r in out} == {1}

    def test_deterministic_across_partitionings(self, spark):
        rows = [
            (i, ["a" * (20 + i % 7), "a" * 35, "a" * 28],
             ["b" * (20 + i % 7), "b" * 64])
            for i in range(20)
        ]
        df = spark.createDataFrame(
            rows, "pair_id long, src array<string>, tgt array<string>"
        )
        a = sorted(map(tuple,
                       gale_church_align(df, "pair_id", "src", "tgt")
                       .collect()))
        b = sorted(map(tuple,
                       gale_church_align(df.repartition(9), "pair_id",
                                         "src", "tgt").collect()))
        assert a == b
