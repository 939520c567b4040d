"""Probe the weighted-4C sampler reformulation (round 3 mapping-floor fix).

prof_mapping15 established: the 12 ms plane-backward blowup is the
lane-offset placement of a MATERIALIZED [N, C] cotangent (the MLP
backward's matmul output) into [N, 4C] scatter values; fused/generated
operands place for free (variant B: 4.25 ms), and narrow-row scatters are
far worse (39-127 ms).

Reformulation: the sampler returns corner-weighted rows
    gw[n, kC+c] = g[n, kC+c] * w_k[n]          (elementwise, fusable)
and the decoder's first layer uses 4x row-tiled weights W4 = tile(W):
    h = (gw_xy + gw_xz + gw_yz) @ W4   ==   (sum_k g_k w_k) @ W
The backward cotangent d_gw = dh @ W4^T is then a single matmul whose
OUTPUT is already [N, 4C] — no interleave of materialized pieces — and the
scatter operand d_gw * w4e is elementwise-fusable.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

K, N_WALL = 40, 5


def timed(name, fn, *args):
    float(np.asarray(fn(*args)).ravel()[0])
    walls = []
    for _ in range(N_WALL):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)).ravel()[0])
        walls.append(time.perf_counter() - t0)
    per = float(np.median(walls)) / K * 1e3
    print(f"{name:44s} {per:8.2f} ms/iter", flush=True)
    return per


def make_weighted_sampler():
    from mneslam_tpu.ops import interp

    @jax.custom_vjp
    def sample_weighted(plane, coords):
        out, _ = _fwd_impl(plane, coords)
        return out

    def _fwd_impl(plane, coords):
        C, H, W = plane.shape
        x = jnp.clip((coords[:, 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
        y = jnp.clip((coords[:, 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = (x - x0).astype(plane.dtype)
        wy = (y - y0).astype(plane.dtype)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        idx = y0i * W + x0i
        g = interp.pack_corners(plane)[idx]            # [N, 4C]
        w4e = _w4e(wx, wy, C, g.dtype)                 # [N, 4C], fused
        return g * w4e, (g, wx, wy, idx)

    def _w4e(wx, wy, C, dtype):
        n = wx.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (n, 4 * C), 1) // C
        w00 = ((1 - wx) * (1 - wy))[:, None]
        w01 = (wx * (1 - wy))[:, None]
        w10 = ((1 - wx) * wy)[:, None]
        w11 = (wx * wy)[:, None]
        return jnp.select([lane == 0, lane == 1, lane == 2],
                          [jnp.broadcast_to(w00, (n, 4 * C)),
                           jnp.broadcast_to(w01, (n, 4 * C)),
                           jnp.broadcast_to(w10, (n, 4 * C))],
                          jnp.broadcast_to(w11, (n, 4 * C))).astype(dtype)

    def fwd(plane, coords):
        out, (g, wx, wy, idx) = _fwd_impl(plane, coords)
        return out, (g, wx, wy, idx, coords, plane)

    def bwd(res, dout):
        g, wx, wy, idx, coords, plane = res
        C, H, W = plane.shape
        dout = dout.astype(plane.dtype)
        w4e = _w4e(wx, wy, C, plane.dtype)
        vals = dout * w4e                              # fusable elementwise
        d_packed = jnp.zeros((H * W, 4 * C), vals.dtype).at[idx].add(vals)
        d_plane = interp._unpack_corners_adjoint(d_packed, C, H, W)
        d_coords = jnp.zeros_like(coords)              # not needed here
        return d_plane, d_coords

    sample_weighted.defvjp(fwd, bwd)
    return sample_weighted


def main():
    from mneslam_tpu.data import rays as rays_lib
    from mneslam_tpu.mapping import keyframe as kf_lib
    from tools.prof_mapping12 import build

    cfg, scene, mapper, st, frame, c2w = build()
    H, W = frame["depth"].shape
    n_global, n_cur = 2048, 100
    dir_flat = frame["direction"].reshape(-1, 3)
    d_flat = frame["depth"].reshape(-1)
    print(f"device={jax.devices()[0]}  K={K}", flush=True)

    sample_weighted = make_weighted_sampler()

    def sample_pts(db, kf_poses, key):
        k_db, k_cur, k_render = jax.random.split(key, 3)
        g_rays, slot_ids = kf_lib.sample_global_rays(db, k_db, n_global)
        g_poses = kf_poses[slot_ids]
        g_o, g_d = rays_lib.rays_from_pose(g_rays[:, :3], g_poses)
        idx = jax.random.randint(k_cur, (n_cur,), 0, H * W)
        c_o, c_d = rays_lib.rays_from_pose(dir_flat[idx], c2w)
        rays_o = jnp.concatenate([g_o, c_o], axis=0)
        rays_d = jnp.concatenate([g_d, c_d], axis=0)
        t_d = jnp.concatenate([g_rays[:, 6], d_flat[idx]], axis=0)[:, None]
        z_vals = scene.sample_z_vals(t_d, rays_o.shape[0], k_render)
        return (rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]).reshape(-1, 3)

    def loss_weighted(p, db, kf_poses, key):
        """L1-equivalent loss through the weighted-4C formulation."""
        pts = sample_pts(db, kf_poses, key)
        p_nor = scene._normalize(pts)
        pos = scene.pos_encode(scene._normalize01(pts))
        planes = p["planes"]
        w0 = p["decoder"]["sdf"][0]                   # [2C + P, hidden]
        C = planes["xy"][0].shape[0]
        h = None
        off = 0
        for lvl in range(2):
            gw = (sample_weighted(planes["xy"][lvl], p_nor[:, [0, 1]])
                  + sample_weighted(planes["xz"][lvl], p_nor[:, [0, 2]])
                  + sample_weighted(planes["yz"][lvl], p_nor[:, [1, 2]]))
            W4 = jnp.concatenate([w0[off:off + C]] * 4, axis=0)  # [4C, hidden]
            part = gw @ W4
            h = part if h is None else h + part
            off += C
        h = h + pos.astype(h.dtype) @ w0[off:]
        h = jax.nn.relu(h)
        for wl in p["decoder"]["sdf"][1:]:
            h = h @ wl
        return h.sum()

    args = (st.params, st.db, st.kf_poses, jax.random.PRNGKey(0))

    @jax.jit
    def probe(p, db, kf_poses, key):
        def body(i, p):
            gg = jax.grad(loss_weighted)(p, db, kf_poses, jax.random.fold_in(key, i))
            return jax.tree.map(lambda a, b: a - 1e-12 * b.astype(a.dtype), p, gg)
        p = jax.lax.fori_loop(0, K, body, p)
        return p["decoder"]["sdf"][0][0, 0] + p["planes"]["xy"][1][0, 0, 0]

    r = timed("L1 via weighted-4C sampler fwd+bwd", probe, *args)
    print(json.dumps({"weighted4c": r}), flush=True)


if __name__ == "__main__":
    main()
