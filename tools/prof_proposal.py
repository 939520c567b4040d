"""Edge-proposal cost at ScanNet scale (buffer 512) — VERDICT weak #7.

The host-side greedy NMS proposal (graph.add_proximity_factors /
backend._propose_edges) is O(t^2) python around a chunked device
frame_distance. Measures both halves at t = 128 / 256 / 512.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    from mneslam_tpu.models import droid_net
    from mneslam_tpu.tracking import video as video_lib
    from mneslam_tpu.tracking.graph import FactorGraph

    H, W = 320, 640
    ht, wd = H // 8, W // 8
    buffer = 512
    params = droid_net.init_droid_net(jax.random.PRNGKey(0))
    state = video_lib.init_video(buffer, ht, wd)
    rng = np.random.default_rng(1)
    # poses drift along a line so frame distances are informative
    poses = np.tile([0, 0, 0, 0, 0, 0, 1.0], (buffer, 1)).astype(np.float32)
    poses[:, 0] = np.arange(buffer) * 0.02
    state = state._replace(
        poses=jnp.asarray(poses),
        disps=jnp.ones((buffer, ht, wd)) * 0.7,
        timestamps=jnp.arange(buffer, dtype=jnp.float32),
    )
    intr8 = jnp.asarray([W / 16, W / 16, W / 16 - 0.5, H / 16 - 0.5])

    print(f"device={jax.devices()[0]}  buffer={buffer}", flush=True)
    for t in (128, 256, 512):
        graph = FactorGraph(buffer, ht, wd, capacity=384, params=params,
                            intrinsics=intr8, window=25, max_factors=75)
        # warm the frame_distance jit for this shape
        t0 = time.perf_counter()
        graph.add_proximity_factors(state, t=t, t0=0, t1=0, rad=2, nms=2,
                                    beta=0.25, thresh=16.0)
        warm = time.perf_counter() - t0

        graph2 = FactorGraph(buffer, ht, wd, capacity=384, params=params,
                             intrinsics=intr8, window=25, max_factors=75)
        t0 = time.perf_counter()
        graph2.add_proximity_factors(state, t=t, t0=0, t1=0, rad=2, nms=2,
                                     beta=0.25, thresh=16.0)
        total = time.perf_counter() - t0

        # distance matrix alone (device + fetch)
        ix = np.arange(0, t)
        ii, jj = np.meshgrid(ix, ix, indexing="ij")
        t0 = time.perf_counter()
        d = video_lib.frame_distance_padded(
            state, intr8, ii.reshape(-1), jj.reshape(-1), beta=0.25)
        dist = time.perf_counter() - t0
        print(f"t={t:4d}: proposal {total*1e3:8.1f} ms "
              f"(frame_distance {dist*1e3:8.1f} ms, host {1e3*(total-dist):7.1f} ms; "
              f"warm incl compile {warm:.1f} s; edges={graph2.n_active})",
              flush=True)


if __name__ == "__main__":
    main()
