"""Isolated A/B: fold_corners_rows border handling at row-shard block size.

A: shipped (iota mask + 2 full-block jnp.where, traced y0)
B: dynamic-row variant (single-row dus-add for the y==H-1 self-border,
   single masked row zeroing... pad rows handled by a row-range where on
   a [Hb,1,1] iota — kept, it's the cheap part) — traced y0.
K=200 chained, 6 planes worth of work per iter approximated by the fine
plane x2 + coarse x1 per axis pair? -> just measure ONE fine fold; scale
is linear. fp32.
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np

H, W, C = 401, 401, 32
n_sh = 8
Hpad = -(-H // n_sh) * n_sh
Hb = Hpad // n_sh
key = jax.random.PRNGKey(0)
d = jax.random.normal(key, (Hb * W, 4 * C), jnp.float32)
halo = jax.random.normal(jax.random.fold_in(key, 1), (W, C), jnp.float32)

def _shift_back_x(a):
    main = jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)
    return main.at[:, -1].add(a[:, -1])

def _fold_b(dr):
    d10 = dr[..., 2 * C:3 * C]
    d11 = dr[..., 3 * C:4 * C]
    return d10 + _shift_back_x(d11)

def fold_A(d_rows, y0, halo_row):
    dd = d_rows.reshape(Hb, W, 4 * C)
    zdt = d_rows.dtype
    d00 = dd[..., :C]; d01 = dd[..., C:2 * C]
    b = _fold_b(dd)
    shifted = jnp.concatenate([halo_row.reshape(1, W, C), b[:-1]], axis=0)
    y = y0 + jax.lax.broadcasted_iota(jnp.int32, (Hb, 1, 1), 0)
    out = d00 + _shift_back_x(d01) + shifted + \
        jnp.where(y == H - 1, b, jnp.zeros((), zdt))
    out = jnp.where(y < H, out, jnp.zeros((), zdt))
    return out.reshape(Hb * W, C)

def fold_B(d_rows, y0, halo_row):
    dd = d_rows.reshape(Hb, W, 4 * C)
    zdt = d_rows.dtype
    d00 = dd[..., :C]; d01 = dd[..., C:2 * C]
    b = _fold_b(dd)
    shifted = jnp.concatenate([halo_row.reshape(1, W, C), b[:-1]], axis=0)
    out = d00 + _shift_back_x(d01) + shifted
    # y==H-1 self-border: at most ONE row in one shard — dynamic-row add
    r = H - 1 - y0
    rc = jnp.clip(r, 0, Hb - 1)
    in_blk = (r >= 0) & (r < Hb)
    row = jnp.where(in_blk, b[rc], jnp.zeros((), zdt))
    out = out.at[rc].add(row)
    # pad rows: only the LAST shard has them — row-range where on [Hb,1,1]
    y = y0 + jax.lax.broadcasted_iota(jnp.int32, (Hb, 1, 1), 0)
    out = jnp.where(y < H, out, jnp.zeros((), zdt))
    return out.reshape(Hb * W, C)

def chain(fold):
    def run(d, y0, halo):
        def body(i, c):
            o = fold(c, y0, halo)
            # feed back so iterations chain (pad o back to 4C)
            return jnp.concatenate([o, o, o, o], axis=1) * 0.25 + d * 1e-6
        out = jax.lax.fori_loop(0, 200, body, d)
        return out[0, 0]
    return jax.jit(run)

# equality first (traced y0 over all shards)
for s in range(n_sh):
    y0 = jnp.asarray(s * Hb)
    a = fold_A(d, y0, halo); b = fold_B(d, y0, halo)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
print("equal OK")

for name, fold in (("A iota-where", fold_A), ("B dus-row", fold_B)):
    fn = chain(fold)
    y0 = jnp.asarray(6 * Hb)
    float(np.asarray(fn(d, y0, halo)))
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(fn(d, y0, halo)))
        walls.append(time.perf_counter() - t0)
    print(name, "ms/fold:", round(float(np.median(walls)) / 200 * 1e3, 4))
