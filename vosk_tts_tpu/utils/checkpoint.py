"""Parameter pytree (de)serialization.

Native format is a flat ``.npz``: pytree paths joined with '/'; list levels
use integer keys and are rebuilt as lists on load (a level whose keys are all
digits becomes a list). This replaces the reference's torch ``.pth``
checkpoints (training/vits2/utils.py:18-63); conversion from those lives in
utils/torch_params.py + tools/convert_checkpoint.py.

For training state (params + optimizer + step) use ``save_train_state`` /
``load_train_state`` which wrap the same format with a ``meta.json`` sidecar,
mirroring the reference's {model, optimizer, iteration, learning_rate} bundle.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax


_NONE_KEY = "__none_keys__"


def _flatten(tree, prefix="", nones=None):
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
        return out
    for k, v in items:
        if v is None:
            if nones is not None:
                nones.append(f"{prefix}{k}")
            continue
        out.update(_flatten(v, f"{prefix}{k}/", nones))
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for key, value in flat.items():
        if key == _NONE_KEY:
            continue
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [listify(node[str(i)]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    root = listify(root)

    # restore explicit None leaves (bias-free convs)
    if _NONE_KEY in flat:
        for key in flat[_NONE_KEY]:
            parts = str(key).split("/")
            node = root
            for p in parts[:-1]:
                node = node[int(p)] if isinstance(node, list) else node[p]
            leaf = parts[-1]
            if isinstance(node, list):
                node[int(leaf)] = None
            else:
                node[leaf] = None
    return root


def save_params(path: str, params) -> None:
    nones: list = []
    flat = _flatten(jax.device_get(params), nones=nones)
    if nones:
        flat[_NONE_KEY] = np.asarray(nones)
    np.savez(path, **flat)


def load_params(path: str):
    with np.load(path, allow_pickle=False) as data:
        return _unflatten({k: data[k] for k in data.files})


def save_leaves(path: str, tree) -> None:
    """Positional-leaf serialization for arbitrary pytrees (optax states
    contain namedtuples and empty nodes the named format can't round-trip).
    Restore with ``load_leaves`` against a structurally identical template."""
    leaves = jax.tree.leaves(jax.device_get(tree))
    np.savez(path, **{f"l{i:06d}": np.asarray(v) for i, v in enumerate(leaves)})


def load_leaves(path: str, template):
    treedef = jax.tree.structure(template)
    with np.load(path, allow_pickle=False) as data:
        n = len(data.files)
        if n != treedef.num_leaves:
            raise ValueError(f"{path}: {n} leaves, template needs {treedef.num_leaves}")
        leaves = [data[f"l{i:06d}"] for i in range(n)]
    return jax.tree.unflatten(treedef, leaves)


def save_full_state(dirname: str, tag: str, step: int, state, extra: dict | None = None):
    """Full train state (params + optimizer namedtuples + step) for resume."""
    os.makedirs(dirname, exist_ok=True)
    save_leaves(os.path.join(dirname, f"{tag}_{step}.npz"), state)
    with open(os.path.join(dirname, f"{tag}_{step}.meta.json"), "w") as f:
        json.dump({"step": step, **(extra or {})}, f)


def load_full_state(dirname: str, tag: str, template, step: int | None = None):
    """Latest (or given-step) full train state restored into ``template``'s
    structure. Returns (state, meta) or None."""
    if step is None:
        path = latest_checkpoint(dirname, prefix=f"{tag}_")
        if path is None:
            return None
    else:
        path = os.path.join(dirname, f"{tag}_{step}.npz")
        if not os.path.exists(path):
            return None
    state = load_leaves(path, template)
    base = path[: -len(".npz")]
    meta = {}
    if os.path.exists(base + ".meta.json"):
        meta = json.load(open(base + ".meta.json"))
    return state, meta


def latest_checkpoint(dirname: str, prefix: str = "G_") -> str | None:
    """Newest ``{prefix}*.npz`` by step number (utils.py:77 equivalent)."""
    best, best_step = None, -1
    if not os.path.isdir(dirname):
        return None
    for name in os.listdir(dirname):
        if name.startswith(prefix) and name.endswith(".npz"):
            try:
                step = int(name[len(prefix) : -4])
            except ValueError:
                continue
            if step > best_step:
                best, best_step = os.path.join(dirname, name), step
    return best


def save_train_state(dirname: str, tag: str, step: int, params, opt_state=None, extra: dict | None = None):
    os.makedirs(dirname, exist_ok=True)
    save_params(os.path.join(dirname, f"{tag}_{step}.npz"), params)
    if opt_state is not None:
        save_params(os.path.join(dirname, f"{tag}_{step}.opt.npz"), opt_state)
    meta = {"step": step, **(extra or {})}
    with open(os.path.join(dirname, f"{tag}_{step}.meta.json"), "w") as f:
        json.dump(meta, f)


def load_train_state(dirname: str, tag: str, step: int | None = None):
    if step is None:
        path = latest_checkpoint(dirname, prefix=f"{tag}_")
        if path is None:
            return None
        # strip possible .opt/.meta hits: latest_checkpoint only matches .npz
        if path.endswith(".opt.npz"):
            path = path[: -len(".opt.npz")] + ".npz"
    else:
        path = os.path.join(dirname, f"{tag}_{step}.npz")
    base = path[: -len(".npz")]
    params = load_params(path)
    opt_state = load_params(base + ".opt.npz") if os.path.exists(base + ".opt.npz") else None
    meta = {}
    if os.path.exists(base + ".meta.json"):
        meta = json.load(open(base + ".meta.json"))
    return {"params": params, "opt_state": opt_state, "meta": meta}
