"""MPEG-1 audio (ISO/IEC 11172-3) Layer I/II: header walk, bit
allocation, scfsi sharing, de-grouping, requantization — all
round-tripped against the module's own planted-field frame writers —
plus the polyphase synthesis properties (band placement, calibrated
gain) and the DataFrame operator's digest/error-row contract."""

from __future__ import annotations

import math

import pytest

from atiesh_spark.operators.mpeg_audio import (
    SCALEFACTORS,
    TABLE_A,
    TABLE_B,
    _quant_params,
    decode_mpeg_audio,
    encode_frame_layer1,
    encode_frame_layer2,
    mpeg_to_pcm,
    parse_mpeg_frames,
    synthesize_pcm,
)


def _layer1_frame(seed: int = 0, mode: int = 3, fs: int = 48000,
                  br: int = 192):
    ch = 1 if mode == 3 else 2
    alloc = [[0] * 32 for _ in range(ch)]
    sfidx = [[0] * 32 for _ in range(ch)]
    codes = [[[0] * 12 for _ in range(32)] for _ in range(ch)]
    for c in range(ch):
        for sb in range(8):
            a = 1 + (seed + sb + c) % 3
            alloc[c][sb] = a
            sfidx[c][sb] = 3 * ((seed + 2 * sb + 5 * c) % 21)
            levels = (1 << (a + 1)) - 1
            for s in range(12):
                codes[c][sb][s] = (seed + sb + s + c) % levels
    return encode_frame_layer1(fs, br, mode, alloc, sfidx, codes), (
        alloc, sfidx, codes)


def _layer2_frame(seed: int = 0, mode: int = 0, fs: int = 48000,
                  br: int = 192):
    ch = 1 if mode == 3 else 2
    table = TABLE_A if fs == 48000 else TABLE_B
    alloc = [[0] * 32 for _ in range(ch)]
    scfsi = [[0] * 32 for _ in range(ch)]
    sfidx = [[None] * 32 for _ in range(ch)]
    codes = [[[0] * 36 for _ in range(32)] for _ in range(ch)]
    for c in range(ch):
        for sb in range(8):
            a = 1 + (seed + sb + c) % 3
            alloc[c][sb] = a
            sc = (seed + sb + c) % 4
            scfsi[c][sb] = sc
            ntrans = {0: 3, 1: 2, 2: 1, 3: 2}[sc]
            sfidx[c][sb] = [
                3 * ((seed + 2 * sb + j + 5 * c) % 21)
                for j in range(ntrans)
            ]
            levels = table[sb][a - 1]
            for s in range(36):
                codes[c][sb][s] = (seed + sb + s + c) % levels
    return encode_frame_layer2(fs, br, mode, alloc, scfsi, sfidx,
                               codes), (alloc, scfsi, sfidx, codes)


class TestQuantParams:
    def test_formula_reproduces_published_cd_table(self):
        """The derived (C, D) formula must reproduce the published
        Table 3-B.4 requantization constants."""
        want = {
            3: (4 / 3, 0.5), 5: (8 / 5, 0.5), 7: (8 / 7, 0.25),
            9: (16 / 9, 0.5), 15: (16 / 15, 0.125),
            31: (32 / 31, 0.0625), 63: (64 / 63, 0.03125),
        }
        for levels, (c, d) in want.items():
            nb, cc, dd = _quant_params(levels)
            assert math.isclose(cc, c) and math.isclose(dd, d), levels

    def test_scalefactor_ladder(self):
        assert SCALEFACTORS[0] == 2.0
        assert math.isclose(SCALEFACTORS[3], 1.0)
        assert math.isclose(SCALEFACTORS[1], 1.5874010519682)
        assert len(SCALEFACTORS) == 63

    def test_alloc_table_shapes(self):
        assert len(TABLE_A) == 27 and len(TABLE_B) == 30
        assert len(TABLE_A[0]) == 15 and TABLE_A[0][0] == 3
        assert TABLE_A[3][-1] == 65535 and TABLE_A[3][-2] == 8191
        assert len(TABLE_A[11]) == 7 and len(TABLE_A[23]) == 3
        assert TABLE_B[27:] == (TABLE_B[26],) * 3


class TestHeaderErrors:
    def test_bad_streams_raise(self):
        blob, _ = _layer1_frame()
        cases = {
            "bad sync": b"\x00" + blob[1:],
            "Layer III": bytes([blob[0], (blob[1] & ~0x06) | 0x02])
            + blob[2:],
            "free bitrate": bytes([blob[0], blob[1], blob[2] & 0x0F])
            + blob[3:],
            "invalid bitrate": bytes([blob[0], blob[1], blob[2] | 0xF0])
            + blob[3:],
            "reserved fs": bytes([blob[0], blob[1], blob[2] | 0x0C])
            + blob[3:],
            "truncated": blob[:40],
        }
        for name, bad in cases.items():
            with pytest.raises(ValueError):
                parse_mpeg_frames(bad)
        # joint stereo (mode 01) is an explicit unsupported error
        joint = bytearray(_layer2_frame(mode=0)[0])
        joint[3] = (joint[3] & ~0xC0) | 0x40
        with pytest.raises(ValueError, match="joint"):
            parse_mpeg_frames(bytes(joint))

    def test_low_rate_cd_tables_rejected(self):
        with pytest.raises(ValueError, match="C/D"):
            _layer2_frame(br=48, mode=3)

    def test_crc_presence_is_skipped_not_fatal(self):
        """protection=0 inserts 16 CRC bits after the header; the
        decoder must skip them and land on the same fields."""
        blob, (alloc, sfidx, codes) = _layer1_frame()
        f0 = parse_mpeg_frames(blob)[0]
        with_crc = bytearray(blob)
        with_crc[1] &= ~0x01  # protection bit -> 0 (CRC present)
        # splice 2 CRC bytes in, drop 2 pad bytes to keep frame_len
        with_crc = bytes(with_crc[:4]) + b"\xBE\xEF" + bytes(
            with_crc[4:-2]
        )
        f1 = parse_mpeg_frames(with_crc)[0]
        assert f1["alloc"] == f0["alloc"]
        assert f1["raw"] == f0["raw"]


class TestLayerI:
    def test_round_trip_fields_and_values(self):
        for mode in (3, 0):
            blob, (alloc, sfidx, codes) = _layer1_frame(seed=5, mode=mode)
            frames = parse_mpeg_frames(blob)
            assert len(frames) == 1
            f = frames[0]
            assert (f["layer"], f["sample_rate"], f["bitrate_kbps"]) == (
                1, 48000, 192)
            assert f["channels"] == (1 if mode == 3 else 2)
            assert f["alloc"] == alloc
            assert f["raw"] == codes
            # spot-check the requantized grid: value = sf * 2k/L
            for c in range(f["channels"]):
                for sb in range(8):
                    a = alloc[c][sb]
                    levels = (1 << (a + 1)) - 1
                    sf = SCALEFACTORS[sfidx[c][sb]]
                    for s in range(12):
                        k = codes[c][sb][s] - (levels - 1) // 2
                        assert math.isclose(
                            f["samples"][c][sb][s], sf * 2 * k / levels,
                            rel_tol=0, abs_tol=1e-12)

    def test_multi_frame_stream(self):
        b1, _ = _layer1_frame(seed=1)
        b2, _ = _layer1_frame(seed=2)
        frames = parse_mpeg_frames(b1 + b2)
        assert len(frames) == 2
        assert frames[0]["raw"] != frames[1]["raw"]


class TestLayerII:
    @pytest.mark.parametrize("fs,sblimit", [(48000, 27), (44100, 30),
                                            (32000, 30)])
    def test_round_trip_both_tables(self, fs, sblimit):
        blob, (alloc, scfsi, sfidx, codes) = _layer2_frame(
            seed=3, mode=0, fs=fs)
        f = parse_mpeg_frames(blob)[0]
        assert (f["layer"], f["sample_rate"]) == (2, fs)
        assert f["alloc"] == alloc
        assert f["scfsi"] == scfsi
        assert f["raw"] == codes

    def test_scfsi_sharing_expansion(self):
        blob, (alloc, scfsi, sfidx, codes) = _layer2_frame(seed=0)
        f = parse_mpeg_frames(blob)[0]
        for c in range(2):
            for sb in range(8):
                t, sc = sfidx[c][sb], scfsi[c][sb]
                want = {0: lambda: [t[0], t[1], t[2]],
                        1: lambda: [t[0], t[0], t[1]],
                        2: lambda: [t[0], t[0], t[0]],
                        3: lambda: [t[0], t[1], t[1]]}[sc]()
                assert f["sfidx"][c][sb] == want, (c, sb, sc)

    def test_grouped_and_ungrouped_values(self):
        table = TABLE_A
        blob, (alloc, scfsi, sfidx, codes) = _layer2_frame(seed=7)
        f = parse_mpeg_frames(blob)[0]
        for c in range(2):
            for sb in range(8):
                levels = table[sb][alloc[c][sb] - 1]
                for s in range(36):
                    part = s // 12
                    sf = SCALEFACTORS[f["sfidx"][c][sb][part]]
                    k = codes[c][sb][s] - (levels - 1) // 2
                    assert math.isclose(
                        f["samples"][c][sb][s], sf * 2 * k / levels,
                        rel_tol=0, abs_tol=1e-12), (c, sb, s, levels)

    def test_overrun_code_is_error(self):
        """An allocation whose codes would overrun the frame length
        must raise, not read garbage."""
        blob, _ = _layer2_frame()
        with pytest.raises(ValueError):
            parse_mpeg_frames(blob[:-500] )


class TestSynthesis:
    def test_band_placement_and_gain(self):
        import numpy as np

        for kband, amp_in in ((0, 0.7), (4, 0.5), (15, 0.3), (31, 0.4)):
            sub = np.zeros((128, 32))
            sub[:, kband] = amp_in
            out = synthesize_pcm(sub)[2048:]
            spec = np.abs(np.fft.rfft(out * np.hanning(out.size)))
            fpk = spec.argmax() / out.size
            # constant subband input = subband-domain DC -> a tone at
            # one of the band's edge frequencies
            lo, hi = kband / 64, (kband + 1) / 64
            assert lo - 0.002 <= fpk <= hi + 0.002, (kband, fpk)
            amp = float(np.abs(out).max())
            assert abs(amp - amp_in) < 0.15 * amp_in, (kband, amp)

    def test_mpeg_to_pcm_shapes(self):
        import numpy as np

        blob, _ = _layer2_frame(mode=0)
        sr, ch, pcm = mpeg_to_pcm(blob + blob + blob)
        assert (sr, ch) == (48000, 2)
        assert pcm.shape == (3 * 1152, 2)
        assert np.abs(pcm).max() < 4.0  # bounded output
        b1, _ = _layer1_frame(mode=3)
        sr, ch, pcm = mpeg_to_pcm(b1)
        assert (sr, ch, pcm.shape) == (48000, 1, (384, 1))


class TestDataFrameOperator:
    def test_digests_and_error_rows(self, spark):
        blob2, (alloc, scfsi, sfidx, codes) = _layer2_frame(seed=4)
        blob1, (a1, s1, c1) = _layer1_frame(seed=4, mode=3)
        df = spark.createDataFrame(
            [(1, bytearray(blob2)), (2, bytearray(blob1)),
             (3, bytearray(b"not audio at all")), (4, None)],
            "media_id long, blob binary",
        )
        got = {r.media_id: r for r in
               decode_mpeg_audio(df, "media_id", "blob").collect()}
        r2 = got[1]
        assert (r2.layer, r2.sample_rate, r2.channels, r2.n_frames,
                r2.n_samples) == (2, 48000, 2, 1, 1152)
        assert r2.alloc_sum == sum(alloc[c][sb]
                                   for c in range(2) for sb in range(32))
        assert r2.code_sum == sum(codes[c][sb][s] for c in range(2)
                                  for sb in range(8) for s in range(36))
        # rq_q4_sum: recompute from the plant
        f = parse_mpeg_frames(blob2)[0]
        want_rq = 0
        for c in range(2):
            for sb in range(8):
                for s in range(36):
                    v = f["samples"][c][sb][s]
                    want_rq += int(math.floor(v * 10000.0 + 0.5))
        assert r2.rq_q4_sum == want_rq
        r1 = got[2]
        assert (r1.layer, r1.channels, r1.n_samples) == (1, 1, 384)
        assert got[3].error is not None and got[3].layer is None
        assert got[4].error == "NULL blob"
