"""Turnkey, self-verifying external-weight importer (SURVEY §2.9).

One command from a user-supplied checkpoint file to a runnable param file:

    python tools/import_weights.py /path/to/droid.pth  --out droid.npz
    python tools/import_weights.py /path/to/Pitts30K_struct.mat --out vlad.npz

For each input the tool
  1. VALIDATES the raw checkpoint against the golden spec — droid.pth's
     state_dict must match `tests/fixtures/droid_state_dict_manifest.json`
     key-for-key and shape-for-shape (missing/extra/mismatched reported);
     the NetVLAD `.mat` must parse to the exact VGG16+NetVLAD+whitening
     shapes (`/root/reference/mp_slam/netvlad.py:76-121`);
  2. converts to the mneslam_tpu param pytree (the reference's key surgery:
     'module.' strip + 2-channel delta/weight head slice,
     `/root/reference/mneslam_mp.py:142-154`);
  3. writes a self-describing flat .npz (`utils/params_io.py`) that
     `tracking.pretrained:` / `checkpoints:` consume directly;
  4. runs a one-frame SMOKE: droid — encode a synthetic frame and run one
     GRU/flow update; NetVLAD — extract one descriptor; asserting finite
     outputs and the expected shapes.

Exit code 0 = the file is ready for SLAM. Any validation or smoke failure
exits non-zero with a precise report.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MANIFEST = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                        "droid_state_dict_manifest.json")


def fail(msg: str):
    print(f"FAIL: {msg}", file=sys.stderr)
    sys.exit(1)


def validate_droid_state_dict(path: str):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    with open(MANIFEST) as f:
        manifest = json.load(f)
    got = {k: list(v.shape) for k, v in sd.items()}
    missing = sorted(set(manifest) - set(got))
    extra = sorted(set(got) - set(manifest))
    bad = sorted(k for k in set(manifest) & set(got)
                 if manifest[k] != got[k])
    problems = []
    if missing:
        problems.append(f"missing keys ({len(missing)}): {missing[:5]} ...")
    if extra:
        problems.append(f"unexpected keys ({len(extra)}): {extra[:5]} ...")
    if bad:
        detail = [f"{k}: expected {manifest[k]}, got {got[k]}" for k in bad[:5]]
        problems.append(f"shape mismatches ({len(bad)}): {detail}")
    if problems:
        fail("droid.pth does not match the golden manifest:\n  "
             + "\n  ".join(problems))
    print(f"validated: {len(got)} tensors match the golden droid manifest")


def import_droid(path: str, out: str):
    import jax
    import jax.numpy as jnp

    from mneslam_tpu.models import droid_net
    from mneslam_tpu.utils.params_io import load_pytree_npz, save_pytree_npz

    validate_droid_state_dict(path)
    params = droid_net.load_droid_weights(path)

    # structural parity with the runtime-initialized net
    ref = droid_net.init_droid_net(jax.random.PRNGKey(0))
    if jax.tree.structure(params) != jax.tree.structure(ref):
        fail("converted pytree structure differs from init_droid_net")
    for (pa, a), (_, b) in zip(jax.tree_util.tree_flatten_with_path(params)[0],
                               jax.tree_util.tree_flatten_with_path(ref)[0]):
        if a.shape != b.shape:
            fail(f"converted shape mismatch at {jax.tree_util.keystr(pa)}: "
                 f"{a.shape} vs {b.shape}")

    save_pytree_npz(out, params)
    reloaded = load_pytree_npz(out)
    for (pa, a), (_, b) in zip(jax.tree_util.tree_flatten_with_path(params)[0],
                               jax.tree_util.tree_flatten_with_path(reloaded)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))

    # one-frame smoke: encode + one GRU/flow update (motion-filter path)
    from mneslam_tpu.tracking.motion_filter import (
        encode_and_flow, encode_context, encode_frame)

    H, W = 120, 160
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((3, H, W), np.float32))
    fmap = encode_frame(reloaded, img)
    net, inp = encode_context(reloaded, img)
    _, delta = encode_and_flow(reloaded, fmap, net, inp, img)
    assert fmap.shape == (128, H // 8, W // 8), fmap.shape
    if not bool(np.isfinite(np.asarray(delta)).all()):
        fail("smoke: GRU/flow update produced non-finite output")
    print(f"smoke OK: fmap {fmap.shape}, one GRU update flow delta "
          f"{float(np.asarray(delta)):.4f} px")
    print(f"wrote {out} — use it as tracking.pretrained in your config")


def import_netvlad(path: str, out: str):
    import jax.numpy as jnp

    from mneslam_tpu.agents import netvlad
    from mneslam_tpu.utils.params_io import load_pytree_npz, save_pytree_npz

    params = netvlad.load_netvlad_mat(path)

    # shape spec: VGG16 conv tower + K=64 clusters over D=512 + 4096 whiten
    expected_channels = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512,
                         512, 512, 512]
    if len(params["convs"]) != 13:
        fail(f"expected 13 VGG16 convs, parsed {len(params['convs'])}")
    in_ch = 3
    for i, (conv, oc) in enumerate(zip(params["convs"], expected_channels)):
        w = conv["weight"]
        if tuple(w.shape) != (oc, in_ch, 3, 3):
            fail(f"conv{i}: expected {(oc, in_ch, 3, 3)}, got {tuple(w.shape)}")
        if conv["bias"].shape != (oc,):
            fail(f"conv{i} bias: expected ({oc},), got {conv['bias'].shape}")
        in_ch = oc
    if tuple(params["score_w"].shape) != (64, 512):
        fail(f"score_w: expected (64, 512), got {tuple(params['score_w'].shape)}")
    if tuple(params["centers"].shape) != (512, 64):
        fail(f"centers: expected (512, 64), got {tuple(params['centers'].shape)}")
    if tuple(params["whiten_w"].shape) != (4096, 512 * 64):
        fail(f"whiten_w: expected (4096, 32768), got {tuple(params['whiten_w'].shape)}")
    if tuple(params["whiten_b"].shape) != (4096,):
        fail(f"whiten_b: expected (4096,), got {tuple(params['whiten_b'].shape)}")
    if params["mean"].shape != (3,):
        fail(f"mean: expected (3,), got {params['mean'].shape}")
    print("validated: VGG16+NetVLAD+whitening shapes all match")

    save_pytree_npz(out, params)
    reloaded = load_pytree_npz(out)

    # one-image smoke
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 3, 120, 160), np.float32))
    desc = np.asarray(netvlad.netvlad_apply(reloaded, img))
    if desc.shape != (1, 4096):
        fail(f"smoke: descriptor shape {desc.shape} != (1, 4096)")
    if not np.isfinite(desc).all():
        fail("smoke: descriptor has non-finite entries")
    if abs(float(np.linalg.norm(desc[0])) - 1.0) > 1e-3:
        fail(f"smoke: descriptor not unit-norm ({np.linalg.norm(desc[0]):.4f})")
    print(f"smoke OK: one descriptor, 4096-d, unit norm")
    print(f"wrote {out} — point checkpoints.<model_name> at it in your config")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="droid.pth / .pt or NetVLAD .mat")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--kind", choices=["droid", "netvlad"], default=None,
                    help="override auto-detection by extension")
    args = ap.parse_args()

    # conversion + smoke are host-side work; avoid the remote-TPU backend
    import jax
    jax.config.update("jax_platforms", "cpu")

    kind = args.kind
    if kind is None:
        ext = os.path.splitext(args.checkpoint)[1].lower()
        kind = {".pth": "droid", ".pt": "droid", ".mat": "netvlad"}.get(ext)
        if kind is None:
            fail(f"cannot infer checkpoint kind from extension {ext!r}; "
                 "pass --kind")
    if kind == "droid":
        import_droid(args.checkpoint, args.out)
    else:
        import_netvlad(args.checkpoint, args.out)


if __name__ == "__main__":
    main()
