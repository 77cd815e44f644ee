"""Generic pytree <-> safetensors (de)serialization for internal
checkpoints: optimizer state, EMA, adapter trees.

The INTERNAL backup format (reference: modules/modelSaver/mixin/
InternalModelSaverMixin.py — optimizer.pt / ema.pt / meta.json) becomes
safetensors files with path-flattened keys plus a JSON meta — no pickle,
portable, mmap-loadable.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.io.safetensors_io import load_safetensors, save_safetensors

SEP = "\x1f"  # unit separator: never collides with user key names


def _encode_key_part(part) -> str:
    if isinstance(part, int):
        return f"#i{part}"
    return str(part)


def _decode_key_part(part: str):
    if part.startswith("#i"):
        return int(part[2:])
    return part


def flatten_pytree(tree) -> tuple[dict[str, np.ndarray], dict]:
    """Flatten an arbitrary pytree of arrays into {key: array} plus a
    structure descriptor that rebuilds the exact container types."""
    flat: dict[str, np.ndarray] = {}

    def visit(node, path):
        if isinstance(node, dict):
            return {"__type__": "dict",
                    "items": {k: visit(v, path + (k,)) for k, v in node.items()}}
        if isinstance(node, (list, tuple)):
            kind = "list" if isinstance(node, list) else "tuple"
            name = type(node).__name__ if kind == "tuple" else None
            return {"__type__": kind,
                    "name": name,
                    "items": [visit(v, path + (i,)) for i, v in enumerate(node)]}
        if node is None:
            return {"__type__": "none"}
        if isinstance(node, (int, float, bool)):
            return {"__type__": "scalar", "value": node}
        if isinstance(node, str):
            return {"__type__": "str", "value": node}
        key = SEP.join(_encode_key_part(p) for p in path)
        flat[key] = np.asarray(node)
        return {"__type__": "array", "key": key}

    structure = visit(tree, ())
    return flat, structure


def unflatten_pytree(flat: dict[str, np.ndarray], structure: dict):
    def build(desc):
        t = desc["__type__"]
        if t == "dict":
            return {k: build(v) for k, v in desc["items"].items()}
        if t == "list":
            return [build(v) for v in desc["items"]]
        if t == "tuple":
            items = [build(v) for v in desc["items"]]
            return tuple(items)
        if t == "none":
            return None
        if t in ("scalar", "str"):
            return desc["value"]
        return jnp.asarray(flat[desc["key"]])

    return build(structure)


def save_pytree(path: str, tree, extra_meta: dict | None = None):
    flat, structure = flatten_pytree(jax.device_get(tree))
    meta = {"structure": json.dumps(structure)}
    if extra_meta:
        meta.update({k: str(v) for k, v in extra_meta.items()})
    if not flat:
        flat = {"__empty__": np.zeros((1,), np.uint8)}
    save_safetensors(path, flat, metadata=meta)


def load_pytree(path: str):
    from onetrainer_tpu.io.safetensors_io import load_metadata
    meta = load_metadata(path)
    flat = load_safetensors(path)
    structure = json.loads(meta["structure"])
    return unflatten_pytree(flat, structure)
