"""Stage-by-stage cost of one dense-BA GN iteration at the combined
(active + inactive) frontend table: window 32, E = 182, HW = 3200.
Direct protocol: each stage program chained K times through a pose
perturbation, scalar fetch.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

K = 10


def direct(name, chain_fn, args, k=K, reps=5):
    f = jax.jit(chain_fn)
    float(np.asarray(f(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(f(*args)))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"{name:58s} {med / k:8.2f} ms/iter  (chain {med:.0f} ms)",
          flush=True)
    return med / k


def main():
    from mneslam_tpu.ops import ba as ba_lib
    from mneslam_tpu.ops import projective

    N, ht, wd = 32, 40, 80
    HW = ht * wd
    E = 182
    D = 6
    key = jax.random.PRNGKey(0)
    poses0 = jnp.tile(jnp.asarray([0., 0, 0, 0, 0, 0, 1.]), (N, 1))
    poses0 = poses0.at[:, 0].set(jnp.arange(N) * 0.02)
    disps = jnp.ones((N, ht, wd)) * 0.7
    intr = jnp.asarray([40., 40., 39.5, 19.5])
    rng = np.random.default_rng(0)
    ii = jnp.asarray(rng.integers(0, N - 1, E), jnp.int32)
    jj = jnp.asarray((np.asarray(ii) + 1 + rng.integers(0, 3, E)) % N,
                     jnp.int32)
    emask = jnp.asarray((np.arange(E) < 150).astype(np.float32))
    target = jnp.zeros((E, ht, wd, 2))
    weight = jnp.ones((E, ht, wd, 2)) * 0.5
    eta = jnp.ones((N, ht, wd)) * 1e-4
    opt_pose = jnp.ones((N,)).at[0].set(0.0)
    print(f"device={jax.devices()[0]}  E={E} window={N}", flush=True)

    def stage(poses, upto):
        coords, valid, (Ji, Jj, Jz) = projective.projective_transform(
            poses, disps, intr, ii, jj, jacobian=True)
        r = (target - coords).reshape(E, HW * 2)
        w = 0.001 * (valid * weight).reshape(E, HW * 2) * emask[:, None]
        acc = coords.sum() + r.sum() + w.sum()
        if upto == 1:
            return acc
        Ji_f = Ji.reshape(E, HW * 2, D)
        Jj_f = Jj.reshape(E, HW * 2, D)
        Jz_f = Jz.reshape(E, HW, 2)
        wJi = w[..., None] * Ji_f
        wJj = w[..., None] * Jj_f
        Hii = jnp.einsum("epi,epj->eij", wJi, Ji_f)
        Hij = jnp.einsum("epi,epj->eij", wJi, Jj_f)
        Hji = jnp.einsum("epi,epj->eij", wJj, Ji_f)
        Hjj = jnp.einsum("epi,epj->eij", wJj, Jj_f)
        vi = jnp.einsum("epi,ep->ei", wJi, r)
        vj = jnp.einsum("epi,ep->ei", wJj, r)
        acc = acc + Hii.sum() + Hij.sum() + Hji.sum() + Hjj.sum() + vi.sum() + vj.sum()
        if upto == 2:
            return acc
        wJi_px = wJi.reshape(E, HW, 2, D)
        wJj_px = wJj.reshape(E, HW, 2, D)
        Ei = jnp.einsum("epcd,epc->edp", wJi_px, Jz_f)
        Ej = jnp.einsum("epcd,epc->edp", wJj_px, Jz_f)
        w_px = w.reshape(E, HW, 2)
        r_px = r.reshape(E, HW, 2)
        Ck = jnp.sum(w_px * Jz_f * Jz_f, axis=-1)
        wk = jnp.sum(w_px * r_px * Jz_f, axis=-1)
        acc = acc + Ei.sum() + Ej.sum() + Ck.sum() + wk.sum()
        if upto == 3:
            return acc
        pair = ii * N + jj
        H = (jax.ops.segment_sum(Hii, ii * N + ii, num_segments=N * N)
             + jax.ops.segment_sum(Hij, pair, num_segments=N * N)
             + jax.ops.segment_sum(Hji, jj * N + ii, num_segments=N * N)
             + jax.ops.segment_sum(Hjj, jj * N + jj, num_segments=N * N)
             ).reshape(N, N, D, D)
        v = (jax.ops.segment_sum(vi, ii, num_segments=N)
             + jax.ops.segment_sum(vj, jj, num_segments=N))
        H = H * opt_pose[:, None, None, None] * opt_pose[None, :, None, None]
        v = v * opt_pose[:, None]
        Hmat = H.transpose(0, 2, 1, 3).reshape(N * D, N * D)
        Hmat = Hmat + jnp.diag(0.1 + 1e-4 * jnp.diagonal(Hmat))
        Hmat = Hmat + jnp.diag(jnp.repeat(1.0 - opt_pose, D))
        C = jax.ops.segment_sum(Ck, ii, num_segments=N) + eta.reshape(N, HW) + 1e-7
        wvec = jax.ops.segment_sum(wk, ii, num_segments=N)
        acc = acc + Hmat.sum() + v.sum() + C.sum() + wvec.sum()
        if upto == 4:
            return acc
        Ecat = jnp.concatenate([Ei, Ej], axis=0)
        pidx = jnp.concatenate([ii, jj])
        kidx = jnp.concatenate([ii, ii])
        Ecat = Ecat * opt_pose[pidx][:, None, None]
        Qk = (1.0 / C)[kidx]
        Pq = Ecat * Qk[:, None, :]
        twoE = Pq.shape[0]
        same_k = (kidx[:, None] == kidx[None, :])
        Gflat = jax.lax.dot_general(
            Pq.reshape(twoE * D, HW), Ecat.reshape(twoE * D, HW),
            (((1,), (1,)), ((), ())))
        G = Gflat.reshape(twoE, D, twoE, D).transpose(0, 2, 1, 3)
        G = G * same_k[:, :, None, None]
        pair_seg = (pidx[:, None] * N + pidx[None, :]).reshape(-1)
        S_blocks = jax.ops.segment_sum(
            G.reshape(-1, D, D), pair_seg, num_segments=N * N
        ).reshape(N, N, D, D)
        S = Hmat - S_blocks.transpose(0, 2, 1, 3).reshape(N * D, N * D)
        rhs_blocks = jnp.einsum("adp,ap->ad", Pq, wvec[kidx])
        rhs = v.reshape(N * D) - jax.ops.segment_sum(
            rhs_blocks, pidx, num_segments=N).reshape(N * D)
        acc = acc + S.sum() + rhs.sum()
        if upto == 5:
            return acc
        dx = ba_lib._solve_psd(S, rhs)
        Etdx = jnp.einsum("adp,ad->ap", Ecat, dx.reshape(N, D)[pidx])
        Etdx = jax.ops.segment_sum(Etdx, kidx, num_segments=N)
        dz = ((wvec - Etdx) / C).reshape(N * HW)
        acc = acc + dx.sum() + dz.sum()
        return acc

    for upto, name in ((1, "S1 projective+jacobians"),
                       (2, "S2 + pose H blocks"),
                       (3, "S3 + E/C/w depth blocks"),
                       (4, "S4 + segment assembly + damping"),
                       (5, "S5 + Schur G + rhs"),
                       (6, "S6 + chol solve + dz (full)")):
        def chain(poses, u=upto):
            def body(i, p):
                acc = stage(p, u)
                return p + 1e-12 * acc
            return jax.lax.fori_loop(0, K, body, poses)[0, 0]

        direct(name, chain, (poses0,))

    # the production call for reference: full bundle_adjust, 2 GN iters
    prob = ba_lib.BAProblem(target=target, weight=weight, eta=eta,
                            ii=ii, jj=jj, mask=emask)

    def chain_full(poses):
        def body(i, p):
            np_, nd = ba_lib.bundle_adjust(p, disps, intr, prob, iters=2)
            return np_ + 1e-12 * nd.sum()
        return jax.lax.fori_loop(0, K, body, poses)[0, 0]

    direct("bundle_adjust (2 GN iters)", chain_full, (poses0,))


if __name__ == "__main__":
    main()
