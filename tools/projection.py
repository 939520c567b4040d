"""Reproducible v5e-N mapping-rate projection for the row-sharded mapper.

Replaces BASELINE.md's hand-computed projection table with a derivation
from (a) MEASURED per-device ms/iter (tools/prof_zero6.py JSON outputs,
or --ms override) and (b) collective payload sizes computed from the
ACTUAL plane shapes the deployment config instantiates (same config as
prof_zero6: bound 4.0 m, coarse 0.04 m / fine 0.02 m — the Replica
reference working scale, /root/reference/configs/Replica/replica.yaml).

Per optimize iteration the synchronous seam moves, per device:
  all-gather  (fwd): receives (N-1)/N of every PACKED [pad_h*W, 4C] table
  reduce-scatter (bwd): sends the same volume of packed cotangents
so ICI ms/iter = 2 * (N-1)/N * packed_bytes / BW.  The ICI bandwidth is
an ASSUMPTION (no multi-chip hardware in this image; default 100 GB/s
effective per device, the round-3 figure; a v5e 2x4 torus may realize up
to ~2x).  Hz columns:
  ceiling     = 1000 / (iters * ms_iter)          (collectives fully hidden
                by XLA's latency-hiding scheduler — upper bound)
  serialized  = 1000 / (iters * (ms_iter + ici))  (no overlap — lower bound)

Round 5: `mapping.shard_gather_every` = k (k-stale loop-invariant
tables, mapper._make_row_body) amortizes the FORWARD all-gather over k
iterations while the gradient reduce-scatter still runs every
iteration, so its ICI ms/iter = (1/k + 1) * (N-1)/N * packed_bytes/BW.
Rows labeled `gN` derive from tools/prof_zero8.py's measured per-device
ms/iter at that k (measurements/zero8/*.txt).

`mapping.shard_fold` = "before" (FB) folds the full packed cotangent
locally and reduce-scatters the RAW [pad_h*W, C] rows — the backward's
ICI payload drops 4x for an n_shards-times-larger per-device fold
(measured by tools/prof_zero9.py, measurements/zero9/*.txt), so
  fold=after :  ICI ms/iter = (1/k + 1)   * (N-1)/N * packed_bytes/BW
  fold=before:  ICI ms/iter = (1/k + 1/4) * (N-1)/N * packed_bytes/BW
Rows labeled `fb`/`gNfb` carry the FB variants' measured ms/iter.

Usage:
  python tools/projection.py                  # read checked-in JSONs
  python tools/projection.py --ms 8:3.93 --ms 16:2.5 --dtype fp32
  python tools/projection.py --bw 200        # 2x-bandwidth column
Host-only (CPU); runs in ~seconds.
"""

import argparse
import glob
import json
import re
import sys

sys.path.insert(0, ".")


def plane_packed_bytes(n_shards: int, dtype_bytes: int) -> int:
    """Total packed-table bytes (all planes, both levels) at the zero6
    deployment config, with rows padded to the shard count as the
    production seam does (mapper._pad_h)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mneslam_tpu.config import make_config
    from mneslam_tpu.models.scene_rep import SceneRep

    bound, coarse, fine = 4.0, 0.04, 0.02
    H, W = 320, 640
    cfg = make_config({
        "mapping": {"bound": [[-bound, bound]] * 3,
                    "marching_cubes_bound": [[-bound, bound]] * 3,
                    "sample": 2048 // n_shards,
                    "min_pixels_cur": 104 // n_shards, "iters": 50},
        "planes_res": {"coarse": coarse, "fine": fine,
                       "bound_dividable": coarse},
        "cam": {"H": H, "W": W, "fx": W / 2, "fy": W / 2,
                "cx": W / 2 - 0.5, "cy": H / 2 - 0.5,
                "H_out": H, "W_out": W, "near": 0.0, "far": 10.0},
        "training": {"n_range_d": 11, "n_samples_d": 32, "range_d": 0.1},
    })
    scene = SceneRep(cfg)
    total = 0
    import jax.random as jr
    params = scene.init_params(jr.PRNGKey(0))
    for which in ("planes", "c_planes"):
        if which not in params:
            continue
        for name in ("xy", "xz", "yz"):
            for pl in params[which][name]:
                C, Hh, Ww = pl.shape
                pad_h = (Hh + n_shards - 1) // n_shards * n_shards
                total += pad_h * Ww * 4 * C * dtype_bytes
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ms", action="append", default=[],
                    help="shards:ms_per_iter override, e.g. 8:3.93")
    ap.add_argument("--dtype", choices=["fp32", "bf16", "both"],
                    default="both")
    ap.add_argument("--bw", type=float, default=100.0,
                    help="assumed effective per-device ICI GB/s")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    measured = {}  # (shards, dtype, k_gather, fold) -> ms/iter
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    paths = sorted(glob.glob(os.path.join(here, "measurements/zero6/*.txt")))
    # post-Pallas-scatter re-measurements (round 4) override the originals
    paths += sorted(glob.glob(os.path.join(here,
                                           "measurements/zero6_pallas/*.txt")))
    # round-5 k-stale runs (prof_zero8) carry S_sync + G2/G4/G8 and
    # override the zero6 sync rows (same probe, fresher measurement)
    paths += sorted(glob.glob(os.path.join(here, "measurements/zero8/*.txt")))
    # round-5 fold="before" runs (prof_zero9): S_sync/G8 re-measurements
    # plus the FB / G8FB minimal-ICI variants
    paths += sorted(glob.glob(os.path.join(here, "measurements/zero9/*.txt")))
    # local re-measurements LAST: a fresh /tmp run must beat every
    # checked-in artifact for the rows it covers
    paths += sorted(glob.glob("/tmp/zero6_*.txt"))
    for path in paths:
        try:
            line = open(path).read().strip().splitlines()[-1]
            d = json.loads(line)
            if d.get("fast"):
                continue  # fast-profile runs are a different sampling config
            dt = "bf16" if d.get("bf16") else "fp32"
            ns = int(d["n_shards"])
            measured[(ns, dt, 1, "after")] = float(d["S_sync"])
            for key, val in d.items():
                m = re.match(r"G(\d+)(FB)?$", key)
                if m:
                    measured[(ns, dt, int(m.group(1)),
                              "before" if m.group(2) else "after")] = float(val)
            if "FB" in d:
                measured[(ns, dt, 1, "before")] = float(d["FB"])
        except (ValueError, KeyError, IndexError):
            continue
    for ov in args.ms:
        m = re.match(r"(\d+):([\d.]+)(?::(fp32|bf16))?$", ov)
        if not m:
            ap.error(f"bad --ms {ov!r}")
        dt = m.group(3) or ("fp32" if args.dtype != "bf16" else "bf16")
        measured[(int(m.group(1)), dt, 1, "after")] = float(m.group(2))

    if not measured:
        ap.error("no zero6 JSONs found and no --ms given")

    dtypes = ["fp32", "bf16"] if args.dtype == "both" else [args.dtype]
    print(f"iters/keyframe={args.iters}  assumed ICI BW={args.bw:.0f} GB/s "
          f"effective per device (ESTIMATE — no multi-chip hardware here)")
    print(f"{'shards':>6} {'dtype':>5} {'seam':>8} {'ms/iter (meas)':>14} "
          f"{'packed MB':>9} {'ICI ms/iter':>11} "
          f"{'Hz ceiling':>10} {'Hz serialized':>13}")
    rows = []
    packed_cache = {}
    for (ns, dt, kg, fold), ms in sorted(measured.items()):
        if dt not in dtypes:
            continue
        if (ns, dt) not in packed_cache:
            packed_cache[(ns, dt)] = plane_packed_bytes(
                ns, 2 if dt == "bf16" else 4)
        nbytes = packed_cache[(ns, dt)]
        one_way = (ns - 1) / ns * nbytes / (args.bw * 1e9) * 1e3
        # all-gather (packed) / k  +  reduce-scatter (packed, or raw = /4)
        bwd = 1.0 if fold == "after" else 0.25
        ici_ms = one_way * (1.0 / kg + bwd)
        hz_ceil = 1000.0 / (args.iters * ms)
        hz_ser = 1000.0 / (args.iters * (ms + ici_ms))
        rows.append({"shards": ns, "dtype": dt, "gather_every": kg,
                     "fold": fold, "ms_iter": ms,
                     "packed_mb": nbytes / 1e6, "ici_ms": ici_ms,
                     "hz_ceiling": hz_ceil, "hz_serialized": hz_ser})
        tag = ("sync" if kg == 1 else f"g{kg}") + (
            "fb" if fold == "before" else "")
        print(f"{ns:>6} {dt:>5} {tag:>8} {ms:>14.2f} {nbytes / 1e6:>9.0f} "
              f"{ici_ms:>11.2f} {hz_ceil:>10.2f} {hz_ser:>13.2f}")
    print(json.dumps({"bw_gbps": args.bw, "iters": args.iters,
                      "rows": rows}))


if __name__ == "__main__":
    main()
