"""Closed-form contract sweep for the JPEG-backed queries.

q199/q209/q213/q214/q222 encode flat, 8x8-aligned constant tiles (value a
linear function of doc_id mod 256) and their DuckDB oracles restate the
decoded pixels in closed form.  Every fixture byte is a function of
``doc_id mod 256`` (all tile-value multipliers are odd, hence coprime to
256) plus small mod-3/4/5 structural cycles, so sweeping doc_id over one
full 256-residue cycle exercises EVERY distinct pixel value each query can
ever produce — at any scale factor and any scale multiplier.

This pins the end-to-end integer-exactness of the codec pair (encode →
decode == generating formula) independently of Spark, so codec-internal
refactors (e.g. the r11 einsum→matmul DCT change, which may legitimately
flip quantization-boundary ulps on NOISE content) are proven harmless for
the declared queries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from logistics_data_pipeline_project_spark.operators.multimodal import (
    decode_avi_mjpeg_frames,
    decode_jpeg_pixels,
    encode_avi_mjpeg,
    encode_jpeg,
)

SWEEP = range(256)


def _probe(payload: bytes):
    w, h, ch, raw = decode_jpeg_pixels(payload)
    return w, h, ch, raw[0], sum(raw)


def test_q199_gray_tiles_sweep():
    tx, ty = 3, 2
    w_px, h_px = tx * 8, ty * 8
    for doc_id in SWEEP:
        raw = bytes(
            (doc_id * 7 + 31 * ((y // 8) * tx + x // 8)) % 256
            for y in range(h_px)
            for x in range(w_px)
        )
        w, h, ch, first, total = _probe(
            encode_jpeg(w_px, h_px, raw, qtable=[8] * 64)
        )
        want = sum(64 * ((doc_id * 7 + 31 * b) % 256) for b in range(tx * ty))
        assert (w, h, ch) == (w_px, h_px, 1)
        assert first == doc_id * 7 % 256
        assert total == want, f"doc {doc_id}: {total} != {want}"


def test_q209_color_tiles_sweep():
    tx, ty = 3, 2
    w_px, h_px = tx * 8, ty * 8
    for doc_id in SWEEP:
        raw = bytes(
            (doc_id * 13 + 29 * ((y // 8) * tx + x // 8)) % 256
            for y in range(h_px)
            for x in range(w_px)
            for _c in range(3)
        )
        w, h, ch, first, total = _probe(
            encode_jpeg(w_px, h_px, raw, qtable=[8] * 64, channels=3)
        )
        want = sum(3 * 64 * ((doc_id * 13 + 29 * b) % 256) for b in range(tx * ty))
        assert (w, h, ch) == (w_px, h_px, 3)
        assert first == doc_id * 13 % 256
        assert total == want, f"doc {doc_id}: {total} != {want}"


def test_q213_subsampled_sweep():
    w_px, h_px = 24, 16
    modes = (("420", 16, 16, 0), ("422", 16, 8, 101))
    tiles = {"420": ((0, 256), (1, 128)), "422": ((0, 128), (1, 64), (2, 128), (3, 64))}
    for doc_id in SWEEP:
        for mode, mw, mh, moff in modes:
            mcux = -(-w_px // mw)
            raw = bytes(
                v
                for y in range(h_px)
                for x in range(w_px)
                for v in [(doc_id * 11 + 37 * ((y // mh) * mcux + x // mw) + moff) % 256] * 3
            )
            w, h, ch, first, total = _probe(
                encode_jpeg(
                    w_px, h_px, raw, qtable=[8] * 64,
                    channels=3, subsampling=mode,
                )
            )
            want = sum(
                ((doc_id * 11 + 37 * t + moff) % 256) * npx * 3
                for t, npx in tiles[mode]
            )
            assert (w, h, ch) == (w_px, h_px, 3)
            assert first == (doc_id * 11 + moff) % 256
            assert total == want, f"doc {doc_id} {mode}: {total} != {want}"


def test_q214_mjpeg_sweep():
    w_px, h_px = 16, 16
    for doc_id in SWEEP:
        n_frames = 3 + doc_id % 5
        frames = [
            encode_jpeg(
                w_px, h_px,
                bytes([(doc_id * 23 + 19 * k) % 256]) * (w_px * h_px * 3),
                qtable=[8] * 64, channels=3, subsampling="420",
            )
            for k in range(n_frames)
        ]
        avi = encode_avi_mjpeg(w_px, h_px, frames, fps=(4, 1))
        w, h, num, den, got = decode_avi_mjpeg_frames(avi)
        assert (w, h, num, den, len(got)) == (w_px, h_px, 4, 1, n_frames)
        for k in (0, 2, 4, 6):  # the 500ms sample points the query decodes
            if k >= n_frames:
                break
            _, _, ch, raw = decode_jpeg_pixels(got[k])
            v = (doc_id * 23 + 19 * k) % 256
            assert ch == 3 and raw[0] == v
            assert sum(raw) == v * w_px * h_px * 3, f"doc {doc_id} frame {k}"


def test_q222_progressive_sweep():
    tx, ty = 4, 2
    w_px, h_px = tx * 8, ty * 8
    for doc_id in SWEEP:
        raw = bytes(
            (doc_id * 13 + 41 * ((y // 8) * tx + x // 8)) % 256
            for y in range(h_px)
            for x in range(w_px)
        )
        w, h, ch, first, total = _probe(
            encode_jpeg(w_px, h_px, raw, qtable=[8] * 64, progressive=True)
        )
        want = sum(64 * ((doc_id * 13 + 41 * b) % 256) for b in range(tx * ty))
        assert (w, h, ch) == (w_px, h_px, 1)
        assert first == doc_id * 13 % 256
        assert total == want, f"doc {doc_id}: {total} != {want}"


if __name__ == "__main__":
    test_q199_gray_tiles_sweep()
    test_q209_color_tiles_sweep()
    test_q213_subsampled_sweep()
    test_q214_mjpeg_sweep()
    test_q222_progressive_sweep()
    print("JPEG query contract sweep OK")
