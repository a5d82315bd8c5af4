"""Shared orbax params save/load for the model wrappers (one copy, two users:
ValleAR and ValleNAR — a one-sided orbax API migration must be impossible)."""

from __future__ import annotations

from pathlib import Path


def save_params(path, params) -> None:
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(Path(path).resolve(), params, force=True)


def load_params(path, template):
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(Path(path).resolve(), item=template)
