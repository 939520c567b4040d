"""Collect a JAX device trace of a target step and print the op breakdown.

Usage:
  python tools/trace_ops.py mapping   # mapping optimize super-step
  python tools/trace_ops.py frontend  # tracker graph.update megastep

Parses the xplane via the installed xprof converter (hlo_op_profile /
op_profile tool) and prints the top ops by self time. Works on the remote
TPU backend (the trace is recorded device-side and fetched with the
result).
"""

import glob
import json
import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def run_mapping(n_reps=10):
    from mneslam_tpu.config import make_config
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.mapping.mapper import Mapper
    from mneslam_tpu.models.scene_rep import SceneRep

    bound, coarse, fine = 4.0, 0.04, 0.02
    H, W = 320, 640
    cfg = make_config({
        "mapping": {"bound": [[-bound, bound]] * 3,
                    "marching_cubes_bound": [[-bound, bound]] * 3,
                    "sample": 2048, "min_pixels_cur": 100, "iters": n_reps},
        "planes_res": {"coarse": coarse, "fine": fine, "bound_dividable": coarse},
        "cam": {"H": H, "W": W, "fx": W / 2, "fy": W / 2,
                "cx": W / 2 - 0.5, "cy": H / 2 - 0.5,
                "H_out": H, "W_out": W, "near": 0.0, "far": 10.0},
        "training": {"n_range_d": 11, "n_samples_d": 32, "range_d": 0.1},
    })
    scene = SceneRep(cfg)
    ds = SyntheticBoxDataset(cfg, num_frames=2, half=bound * 0.9)
    mapper = Mapper(cfg, scene, num_kf=8, rays_per_kf=ds.num_rays_to_save)
    st = mapper.init_state(jax.random.PRNGKey(2))
    frame = {k: jnp.asarray(v) for k, v in ds[0].items() if k != "frame_id"}
    c2w = jnp.asarray(ds[0]["c2w"])
    st = mapper.add_keyframe(st, jnp.asarray(0), frame, c2w, jax.random.PRNGKey(3))

    def step():
        st2, met = mapper.optimize(st, frame, c2w, jax.random.PRNGKey(5),
                                   iters=n_reps)
        return met["loss"]

    return step, n_reps


def run_frontend(n_reps=4):
    from mneslam_tpu.models import droid_net
    from mneslam_tpu.tracking import video as video_lib
    from mneslam_tpu.tracking.graph import FactorGraph

    H, W, buffer, window, factors = 320, 640, 64, 32, 75
    ht, wd = H // 8, W // 8
    params = droid_net.init_droid_net(jax.random.PRNGKey(0))
    if jax.default_backend() != "cpu":
        params = droid_net.cast_params(params, jnp.bfloat16)
    feat_dtype = jax.tree.leaves(params)[0].dtype
    state = video_lib.init_video(buffer, ht, wd, feat_dtype=feat_dtype)
    rng = np.random.default_rng(1)
    state = state._replace(
        fmaps=(jnp.asarray(rng.standard_normal((buffer, 128, ht, wd), np.float32)) * 0.1).astype(feat_dtype),
        inps=(jnp.asarray(rng.standard_normal((buffer, 128, ht, wd), np.float32)) * 0.1).astype(feat_dtype),
        disps=jnp.ones((buffer, ht, wd)) * 0.5,
    )
    intr8 = jnp.asarray([W / 16, W / 16, W / 16 - 0.5, H / 16 - 0.5])
    graph = FactorGraph(buffer, ht, wd, capacity=factors + 16, params=params,
                        intrinsics=intr8, window=window, max_factors=factors)
    n_kf = 26
    ii = np.concatenate([np.arange(0, n_kf - 1), np.arange(1, n_kf),
                         np.arange(0, n_kf - 2), np.arange(2, n_kf)])[:factors]
    jj = np.concatenate([np.arange(1, n_kf), np.arange(0, n_kf - 1),
                         np.arange(2, n_kf), np.arange(0, n_kf - 2)])[:factors]
    graph.add_factors(state, ii, jj)

    holder = {"st": state}

    def step():
        for _ in range(n_reps):
            holder["st"] = graph.update(holder["st"], t0=1, t1=n_kf, iters=2)
        return holder["st"].poses[1]

    return step, n_reps


def main():
    target = sys.argv[1] if len(sys.argv) > 1 else "mapping"
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    step, n_reps = {"mapping": run_mapping, "frontend": run_frontend}[target]()

    # warm/compile
    out = step()
    float(np.asarray(out).ravel()[0])

    trace_dir = tempfile.mkdtemp(prefix=f"trace_{target}_")
    with jax.profiler.trace(trace_dir):
        out = step()
        float(np.asarray(out).ravel()[0])

    planes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                       recursive=True)
    print("xplane files:", planes, flush=True)
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(planes, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    # framework_op_stats returns a gviz JSON table (list of tables)
    t = json.loads(data)
    t = t[0] if isinstance(t, list) else t
    cols = [c["label"] for c in t["cols"]]
    rows = [[(c["v"] if isinstance(c, dict) else c) for c in r["c"]]
            for r in t["rows"]]
    i_self = cols.index("Total self-time (us)")
    i_dev = cols.index("Host/device")
    i_op = cols.index("Operation Name")
    i_type = cols.index("Operation Type")
    dev = [r for r in rows if str(r[i_dev]).lower().startswith("device")]
    dev.sort(key=lambda r: -(r[i_self] or 0))
    tot = sum(r[i_self] or 0 for r in dev)
    print(f"\ndevice total self time: {tot / 1e3 / n_reps:.2f} ms/rep "
          f"({n_reps} reps)\n")
    for r in dev[:top_k]:
        t_us = r[i_self] or 0
        print(f"{t_us / 1e3 / n_reps:9.3f} ms  {100 * t_us / tot:5.1f}%  "
              f"{str(r[i_type])[:16]:16s} {str(r[i_op])[:80]}")


if __name__ == "__main__":
    main()
