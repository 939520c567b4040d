"""Measure the composed agent x rows fleet super-step on silicon
(round 5 — VERDICT r4 next #4).

The composed 2-agent v5e-8 deployment
(`parallel/fleet.make_fleet_super_step_row_sharded`) gives each agent a
4-device row group; its per-device program is the 4-shard row-sharded
mapping step PLUS the replicated `add_keyframe` packing and the
valid-mask select over the whole local map state. One chip executes that
program exactly (`tools/rowshard_step.build_composed_superstep`); this
probe times it with the bench protocol (chained super-step dispatches,
one trailing scalar fetch) and reports per-agent ms/keyframe + Hz —
replacing BASELINE's 4.3 Hz/agent projection with a measured-compute
figure (ICI stays analytic, tools/projection.py).

Usage: python tools/prof_fleet_composed.py [n_shards=4] [--bf16] [--fast]
"""

import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from rowshard_step import measure_composed_ms_kf


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_shards = int(argv[0]) if argv else 4
    bf16 = "--bf16" in sys.argv
    fast = "--fast" in sys.argv
    iters = 25 if fast else 50

    import jax
    print(f"device={jax.devices()[0]}  shards/agent={n_shards}  "
          f"iters/kf={iters}  bf16={bf16}  fast={fast}", flush=True)
    ms = measure_composed_ms_kf(n_shards, bf16=bf16, fast=fast, iters=iters)
    out = {"n_shards": n_shards, "bf16": bf16, "fast": fast, "iters": iters,
           "composed_ms_kf": round(ms, 1),
           "per_agent_kf_hz_compute": round(1e3 / ms, 2)}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
