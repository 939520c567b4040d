"""Inter-agent communication backends.

The reference's fabric (SURVEY.md §5.8) is an mp.Manager descriptor list +
filesystem polling with atomic renames. Here the fabric is an explicit
interface with two backends:

  * `InMemoryComms` — all agents in one process (the TPU-native execution
    model: agents are mesh slices of one JAX program, SURVEY.md §7.1);
    exchange is plain shared host state, deterministic by construction.
  * `FileComms` — the reference's on-disk protocol (atomic tmp+rename of
    key_est_poses.npy / key_timestamps.npy / latest_checkpoint), for
    multi-process deployments and output-contract parity.

Exchanged payloads: descriptor DB entries {descriptor, kf_id, agent_id},
per-agent keyframe poses/timestamps, and map checkpoints (param pytrees +
bounds).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Comms:
    def add_descriptor(self, entry: Dict) -> None:
        raise NotImplementedError

    def descriptors(self) -> List[Dict]:
        raise NotImplementedError

    def publish_keyframes(self, rank: int, poses: np.ndarray, timestamps: np.ndarray) -> None:
        raise NotImplementedError

    def get_keyframes(self, rank: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        raise NotImplementedError

    def publish_checkpoint(self, rank: int, params, meta: Dict) -> None:
        raise NotImplementedError

    def get_checkpoint(self, rank: int):
        raise NotImplementedError


class InMemoryComms(Comms):
    def __init__(self):
        self._db: List[Dict] = []
        self._kf: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._ckpt: Dict[int, Tuple[Any, Dict]] = {}

    def add_descriptor(self, entry: Dict) -> None:
        self._db.append(dict(entry))

    def descriptors(self) -> List[Dict]:
        return list(self._db)

    def publish_keyframes(self, rank, poses, timestamps):
        self._kf[rank] = (np.asarray(poses).copy(), np.asarray(timestamps).copy())

    def get_keyframes(self, rank):
        return self._kf.get(rank)

    def publish_checkpoint(self, rank, params, meta):
        self._ckpt[rank] = (jax.tree.map(jnp.asarray, params), dict(meta))

    def get_checkpoint(self, rank):
        return self._ckpt.get(rank)


class FileComms(Comms):
    """Atomic-rename file exchange (mp_slam/mapper.py:565-592,
    mneslam_mp.py:294-315). Descriptor DB is a per-agent npz directory that
    every agent scans — the lock-free analogue of the Manager list."""

    def __init__(self, out_dir: str, rank: int):
        self.out_dir = out_dir
        self.rank = rank
        self._desc_count = 0
        os.makedirs(self._agent_dir(rank), exist_ok=True)
        os.makedirs(os.path.join(self._agent_dir(rank), "descriptors"), exist_ok=True)

    def _agent_dir(self, rank: int) -> str:
        return os.path.join(self.out_dir, f"agent_{rank}")

    @staticmethod
    def _atomic_save(path: str, save_fn):
        tmp = path + ".tmp"
        save_fn(tmp)
        os.replace(tmp, path)

    def add_descriptor(self, entry: Dict) -> None:
        d = os.path.join(self._agent_dir(self.rank), "descriptors")
        path = os.path.join(d, f"{self._desc_count:06d}.npz")
        self._atomic_save(path, lambda p: _savez_exact(p, {
            "descriptor": np.asarray(entry["descriptor"]),
            "kf_id": np.asarray(entry["kf_id"]),
            "agent_id": np.asarray(entry["agent_id"])}))
        self._desc_count += 1

    def descriptors(self) -> List[Dict]:
        out = []
        if not os.path.isdir(self.out_dir):
            return out
        for name in sorted(os.listdir(self.out_dir)):
            ddir = os.path.join(self.out_dir, name, "descriptors")
            if not os.path.isdir(ddir):
                continue
            for f in sorted(os.listdir(ddir)):
                if not f.endswith(".npz"):
                    continue
                try:
                    z = np.load(os.path.join(ddir, f))
                    out.append({"descriptor": z["descriptor"],
                                "kf_id": int(z["kf_id"]),
                                "agent_id": int(z["agent_id"])})
                except (OSError, ValueError):
                    pass  # torn read of a concurrent write — skip
        return out

    def publish_keyframes(self, rank, poses, timestamps):
        d = self._agent_dir(rank)
        os.makedirs(d, exist_ok=True)
        self._atomic_save(os.path.join(d, "key_est_poses.npy"),
                          lambda p: _save_exact(p, np.asarray(poses)))
        self._atomic_save(os.path.join(d, "key_timestamps.npy"),
                          lambda p: _save_exact(p, np.asarray(timestamps)))

    def get_keyframes(self, rank):
        d = self._agent_dir(rank)
        pp = os.path.join(d, "key_est_poses.npy")
        tp = os.path.join(d, "key_timestamps.npy")
        if not (os.path.exists(pp) and os.path.exists(tp)):
            return None
        return np.load(pp), np.load(tp)

    def publish_checkpoint(self, rank, params, meta):
        d = self._agent_dir(rank)
        os.makedirs(d, exist_ok=True)
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        arrays = {"/".join(str(k) for k in p): np.asarray(v) for p, v in flat}
        for k, v in meta.items():
            arrays["__meta_" + k] = np.asarray(v)
        self._atomic_save(os.path.join(d, "latest_checkpoint.npz"),
                          lambda p: _savez_exact(p, arrays))

    def get_checkpoint(self, rank):
        path = os.path.join(self._agent_dir(rank), "latest_checkpoint.npz")
        if not os.path.exists(path):
            return None
        data = np.load(path)
        params_flat = {k: data[k] for k in data.files if not k.startswith("__meta_")}
        meta = {k[len("__meta_"):]: data[k] for k in data.files if k.startswith("__meta_")}
        return params_flat, meta


def _savez_exact(path: str, arrays: Dict[str, np.ndarray]):
    """np.savez appends .npz — write to the exact temp path instead."""
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def _save_exact(path: str, array: np.ndarray):
    """np.save appends .npy — write to the exact temp path instead."""
    with open(path, "wb") as f:
        np.save(f, array)


def pack_params(params) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {"/".join(str(k) for k in p): np.asarray(v) for p, v in flat}


def unpack_params(template, flat: Dict[str, np.ndarray]):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new = [jnp.asarray(flat["/".join(str(k) for k in p)]) for p, _ in leaves]
    return jax.tree_util.tree_unflatten(treedef, new)
