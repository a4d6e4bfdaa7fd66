"""A/B: libjpeg DCT-scaled frame-dir decode (Config.decode_scale) vs full.

Three measurements:
  1. host decode rate — native batch decode of Kinetics-geometry JPEGs
     (256x342, the canvas default) at denom 1 vs 2 vs 4, clips/s/core
     (frames/s / clip_len). No accelerator needed.
  2. H2D bytes — per-sample canvas-window bytes each mode ships (static
     window sizing, pipeline._window_hw semantics).
  3. (--e2e, needs a device) end-to-end train clips/s via bench.run_e2e at
     decode_scale 1 vs 2 on the on-disk JPEG path.

The lever trades decode numerics (DCT low-pass + decimate instead of the
reference's full decode then bilinear resize, auxiliary_dataset.py:211-266 +
transforms.py:99-107) for ~4x less IDCT work and ~4x fewer H2D bytes per
halving; default stays 1 (exact parity). Embedding-delta bound: the scaled
decode lands within ~1 LSB of a true box filter on smooth content
(tests/test_native.py::test_scaled_decode_approximates_box_downsample).

Usage: python scripts/ab_decode_scale.py [--frames 64] [--reps 5] [--e2e]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=64,
                   help="JPEG frames per timed decode batch")
    p.add_argument("--hw", type=int, nargs=2, default=(256, 342))
    p.add_argument("--clip_len", type=int, default=16)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--e2e", action="store_true",
                   help="also run bench.run_e2e at decode_scale 1 vs 2 "
                        "(uses the available accelerator)")
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    import cv2
    import numpy as np

    from zeroshotvideoclassification_tpu.data import native_decode as nd

    if not (nd.available() and nd.has_scaled_decode()):
        print(json.dumps({"metric": "decode_scale_ab", "value": None,
                          "error": "native scaled decoder unavailable "
                                   "(make -C native)"}))
        return 1

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="zsvc_ab_decode_")
    paths = []
    for i in range(args.frames):
        img = rng.integers(0, 256, (*args.hw, 3), np.uint8)
        pth = os.path.join(tmp, f"f{i}.jpg")
        cv2.imwrite(pth, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
        paths.append(pth)

    rates = {}
    for denom in (1, 2, 4):
        nd.decode_jpeg_batch(paths, scale_denom=denom)  # warm page cache
        best = 0.0
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = nd.decode_jpeg_batch(paths, scale_denom=denom)
            dt = time.perf_counter() - t0
            assert out is not None
            best = max(best, args.frames / dt)
        rates[denom] = best
        print(json.dumps({
            "metric": f"host_decode_denom{denom}",
            "value": round(best / args.clip_len, 2),
            "unit": "clips/s/core",
            "frames_per_sec": round(best, 1),
            "out_hw": list(out.shape[1:3]),
        }))
    print(json.dumps({
        "metric": "decode_scale_speedup_d2",
        "value": round(rates[2] / rates[1], 2), "unit": "x",
        "d4": round(rates[4] / rates[1], 2),
    }))

    # Static H2D window bytes (pipeline._window_hw: ext = ceil(crop *
    # min(canvas)/short_side) + 2, clamped to the canvas). The byte win
    # needs the PAIRED canvas: decode_scale=2 halves Kinetics-geometry
    # frames to <=128x171, so --canvas_hw 128 171 becomes valid and the
    # window shrinks from 226x226 to 114x114 (~3.9x fewer H2D bytes).
    import math

    from zeroshotvideoclassification_tpu.data.transform_params import (
        short_side_for_crop)
    short = short_side_for_crop(112)
    for denom, canvas in ((1, (256, 342)), (2, (128, 171))):
        ch, cw = canvas
        ext = int(math.ceil(112 * (min(ch, cw) / float(short)))) + 2
        wh, ww = min(ch, ext), min(cw, ext)
        print(json.dumps({
            "metric": f"h2d_window_bytes_per_frame_denom{denom}",
            "value": wh * ww * 3, "unit": "bytes",
            "canvas_hw": [ch, cw], "window_hw": [wh, ww]}))

    if args.e2e:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import bench
        for denom, canvas in ((1, None), (2, (128, 171))):
            r = bench.run_e2e(args.bs, args.clip_len, 112, args.steps,
                              "r2plus1d_18", "disk", False,
                              decode_scale=denom, canvas_hw=canvas)
            print(json.dumps({
                "metric": f"e2e_clips_per_sec_decode_scale{denom}",
                "value": round(r["e2e_clips_per_sec"], 2),
                "unit": "clips/s",
                "batch_time_frac": round(r["batch_time_frac"], 3),
                "host_only_clips_per_sec_per_core": round(
                    r["host_only_clips_per_sec_per_core"], 2),
                "canvas_hw": list(canvas) if canvas else None,
            }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
