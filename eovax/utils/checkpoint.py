"""Native checkpoint IO.

Two formats:
- **msgpack** single-file artifacts (flax serialization) for model
  publishing — the TPU-native analogue of the reference's ``.ckpt``.
- **orbax** directories for training state (async save, auto-restore on
  preemption) — the idiomatic replacement for Lightning's
  ``ModelCheckpoint(save_last=True)`` resume flow
  (/root/reference/train.py:155-162, SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any

import jax
from flax import serialization


def save_variables(path: str, variables: dict[str, Any]) -> None:
    """Serialize a variables pytree to a single msgpack file."""
    data = serialization.to_bytes(variables)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


def load_variables(path: str, template: dict[str, Any]) -> dict[str, Any]:
    """Load a msgpack variables file against a template pytree."""
    if os.path.isdir(path):
        return load_orbax(path, template)
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_orbax(path: str, state: Any) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)


def load_orbax(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape")
            else x,
            template,
        )
        return ckptr.restore(os.path.abspath(path), abstract)
