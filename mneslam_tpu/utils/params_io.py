"""Self-describing flat-npz serialization of param pytrees.

The converted external checkpoints (droid.pth, NetVLAD .mat — SURVEY §2.9)
are stored as a single .npz whose keys encode the full pytree path, so
loading needs NO structural template: nested dicts and lists round-trip
exactly. Used by `tools/import_weights.py` (the turnkey importer) and the
runtime loaders (`slam.MNESLAM` accepts a `.npz` in `tracking.pretrained`;
`agents.netvlad.make_descriptor_fn` accepts one in `checkpoints`).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _encode_path(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(["d", str(p.key)])
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(["s", int(p.idx)])
        else:  # GetAttrKey / FlattenedIndexKey — not used by our params
            raise TypeError(f"unsupported pytree path entry {p!r}")
    return json.dumps(parts)


def save_pytree_npz(path: str, tree: Any) -> None:
    """Atomic write of a (dict/list-of-arrays) pytree to one .npz."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {_encode_path(p): np.asarray(v) for p, v in flat}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_pytree_npz(path: str) -> Any:
    """Rebuild the nested dict/list pytree (leaves as jnp arrays)."""
    data = np.load(path, allow_pickle=False)
    root: Dict = {}

    def insert(container, steps, value):
        kind, key = steps[0]
        last = len(steps) == 1
        if kind == "d":
            if last:
                container[key] = value
            else:
                nxt = container.setdefault(
                    key, {} if steps[1][0] == "d" else [])
                insert(nxt, steps[1:], value)
        else:  # sequence
            while len(container) <= key:
                container.append(None)
            if last:
                container[key] = value
            else:
                if container[key] is None:
                    container[key] = {} if steps[1][0] == "d" else []
                insert(container[key], steps[1:], value)

    for enc in data.files:
        steps = [(k, v) for k, v in json.loads(enc)]
        insert(root, steps, jnp.asarray(data[enc]))
    return root
