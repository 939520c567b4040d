"""Subprocess helper: row-sharded mapper equality at an arbitrary virtual
device count (run with XLA_FLAGS=--xla_force_host_platform_device_count=N).

Usage: python tests/_row_sharded_ndev.py N
Builds the tiny synthetic scene, runs the row-sharded mapper on an
N-device mesh and on a 1-device mesh, and asserts leaf-for-leaf equality
— proving the production seam (padding, uneven ray split, packed
all-gather / reduce-scatter decomposition) at shard counts beyond the
8-device test mesh, e.g. the v5e-16 the BASELINE projection quotes.
Exit 0 = equal.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    n_dev = int(sys.argv[1])
    assert len(jax.devices()) >= n_dev, (len(jax.devices()), n_dev)

    from mneslam_tpu.config import make_config
    from mneslam_tpu.data.synthetic import SyntheticBoxDataset
    from mneslam_tpu.mapping.mapper import Mapper
    from mneslam_tpu.models.scene_rep import SceneRep
    from mneslam_tpu.parallel import mesh as pmesh

    cfg = make_config({
        "mapping": {"bound": [[-1.75, 1.75]] * 3,
                    "marching_cubes_bound": [[-1.75, 1.75]] * 3,
                    "sample": 64, "min_pixels_cur": 16},
        "planes_res": {"coarse": 0.5, "fine": 0.25, "bound_dividable": 0.5},
        "cam": {"H": 24, "W": 32, "fx": 20.0, "fy": 20.0, "cx": 15.5,
                "cy": 11.5, "near": 0.0, "far": 5.0},
        "training": {"n_range_d": 7, "n_samples_d": 4, "range_d": 0.2},
        "model": {"c_dim": 8, "input_ch": 16, "input_ch_pos": 48},
    })
    scene = SceneRep(cfg)
    ds = SyntheticBoxDataset(cfg, num_frames=2, half=1.6)
    frame = {k: jnp.asarray(v) for k, v in ds[0].items() if k != "frame_id"}
    pose = jnp.asarray(ds[0]["c2w"])

    results = []
    for devs in (jax.devices()[:1], jax.devices()[:n_dev]):
        mesh = pmesh.make_mesh(1, devices=devs)
        mapper = Mapper(cfg, scene, num_kf=4,
                        rays_per_kf=ds.num_rays_to_save,
                        mesh=mesh, shard_plane_rows=True)
        st = mapper.init_state(jax.random.PRNGKey(2))
        st = mapper.add_keyframe(st, jnp.asarray(0), frame, pose,
                                 jax.random.PRNGKey(3))
        st, met = mapper.optimize(st, frame, pose, jax.random.PRNGKey(4),
                                  iters=4)
        results.append((st, met))

    (st_1, met_1), (st_n, met_n) = results
    np.testing.assert_allclose(float(met_n["loss"]), float(met_1["loss"]),
                               rtol=1e-4)
    for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(st_n.params)[0],
            jax.tree.leaves(st_1.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5,
            err_msg=f"{n_dev}-dev vs 1-dev: {jax.tree_util.keystr(path)}")
    print(f"row-sharded {n_dev}-device == 1-device: OK")


if __name__ == "__main__":
    main()
