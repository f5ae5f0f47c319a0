"""Pretrained model zoo: single-file .npz artifacts bundling params +
TrainConfig + provenance, loadable without a training workdir.

The reference project's usage pattern included published pretrained
snapshots (SURVEY.md §3.4: torch.load state dicts); the TPU-native
equivalent is a flat .npz — params as ``<layer>/<leaf>`` arrays plus a
``__config__`` JSON string and a ``__meta__`` provenance record — created
from any training workdir by ``tools/export_pretrained.py``.

Bundled models live in ``ssdn_tpu/pretrained/``; ``load()`` also accepts a
filesystem path, so exported artifacts can be shared directly.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np

from ssdn_tpu.config import TrainConfig, train_config_from_json

PRETRAINED_DIR = os.path.join(os.path.dirname(__file__), "pretrained")

_CONFIG_KEY = "__config__"
_META_KEY = "__meta__"


def available() -> Dict[str, dict]:
    """name -> meta for every bundled model."""
    out = {}
    if os.path.isdir(PRETRAINED_DIR):
        for f in sorted(os.listdir(PRETRAINED_DIR)):
            if f.endswith(".npz"):
                with np.load(os.path.join(PRETRAINED_DIR, f)) as z:
                    meta = (json.loads(str(z[_META_KEY]))
                            if _META_KEY in z else {})
                out[f[:-4]] = meta
    return out


def _resolve(name_or_path: str) -> str:
    if os.path.exists(name_or_path):
        return name_or_path
    path = os.path.join(PRETRAINED_DIR, name_or_path + ".npz")
    if os.path.exists(path):
        return path
    raise FileNotFoundError(
        f"no pretrained model {name_or_path!r}; bundled: "
        f"{sorted(available()) or '(none)'}"
    )


def load(name_or_path: str) -> Tuple[TrainConfig, Any, dict]:
    """Load a pretrained artifact -> (cfg, params pytree, meta dict).

    The returned params are host numpy arrays in the checkpoint dtype;
    jit/device_put moves them on first use like any other pytree.
    """
    path = _resolve(name_or_path)
    with np.load(path) as z:
        if _CONFIG_KEY not in z:
            raise ValueError(f"{path} is not a ssdn_tpu pretrained artifact "
                             f"(missing {_CONFIG_KEY})")
        cfg = train_config_from_json(str(z[_CONFIG_KEY]))
        meta = json.loads(str(z[_META_KEY])) if _META_KEY in z else {}
        params: Dict[str, Any] = {}
        for key in z.files:
            if key.startswith("__"):
                continue
            node = params
            *parents, leaf = key.split("/")
            for p in parents:
                node = node.setdefault(p, {})
            node[leaf] = z[key]
    return cfg, params, meta


def save(path: str, cfg: TrainConfig, params: Any,
         meta: dict | None = None) -> None:
    """Write a pretrained artifact (inverse of load)."""
    import jax.tree_util as jtu

    from ssdn_tpu.config import to_json

    flat: Dict[str, np.ndarray] = {}
    for kp, v in jtu.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in kp)
        if key.startswith("__") or "/" not in key:
            raise ValueError(f"unsupported params path {key!r}")
        flat[key] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path,
        **flat,
        **{_CONFIG_KEY: np.str_(to_json(cfg)),
           _META_KEY: np.str_(json.dumps(meta or {}))},
    )
