"""WMH parameter persistence + broadcast.

Replaces the reference's ``WeightedMinHashParameters`` asdf model
(``apollo/hasher.py:66-87``) with an .npz checkpoint.  Same reuse rule
as ``doc/model/wmh.md:12-14``: hashing different corpora against
*different* params produces incomparable signatures, so params are
saved once per (dim, size, seed) and reloaded (deferred-init analog of
``apollo/hasher.py:159-166``).

Ray-side distribution: the driver puts the dict in the object store
once (``ray.put``) and each hasher actor reads the reference in
``__init__`` — shipped once per node, not once per batch.  Because
generation is seeded and cheap relative to hashing, actors can also
regenerate locally from (dim, size, seed) — byte-identical by
construction — which avoids shipping ~100 MB when the object store is
under pressure.
"""

from __future__ import annotations

import os

import numpy as np

from apollo_ray.kernels.wmh import generate_params


def params_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "wmh_params.npz")


def save_params(ckpt_dir: str, dim: int, size: int, seed: int) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = params_path(ckpt_dir)
    if not os.path.exists(path):
        p = generate_params(dim, size, seed)
        tmp = path + ".tmp"
        np.savez_compressed(tmp, dim=dim, size=size, seed=seed, **p)
        os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)
    return path


def load_params(path: str, dim: int, size: int, seed: int) -> dict[str, np.ndarray]:
    """Load params, verifying they match the config (the reference
    errors on vocab-size mismatch, ``apollo/hasher.py:171-173``)."""
    with np.load(path) as z:
        if int(z["dim"]) != dim or int(z["size"]) != size or int(z["seed"]) != seed:
            raise ValueError(
                "WMH params mismatch: saved (dim=%d,size=%d,seed=%d) != "
                "config (dim=%d,size=%d,seed=%d)" %
                (int(z["dim"]), int(z["size"]), int(z["seed"]), dim, size, seed))
        return {"rs": z["rs"], "ln_cs": z["ln_cs"], "betas": z["betas"]}
