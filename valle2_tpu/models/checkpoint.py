"""Shared orbax params save/load for the model wrappers (one copy, two users:
ValleAR and ValleNAR — a one-sided orbax API migration must be impossible)."""

from __future__ import annotations

from pathlib import Path


def save_params(path, params) -> None:
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(Path(path).resolve(), params, force=True)


def load_params(path, template, config=None):
    """Restore a params tree shaped like ``template``.

    Accepts BOTH checkpoint layouts a user has on disk:

    - a bare params checkpoint (``ValleAR.save`` / ``save_params``), and
    - a **Trainer step dir** (``train.Trainer.save_checkpoint`` —
      ``{'params', 'opt_state', 'step'}``), the thing every training run
      actually produces (``models/checkpoints/<model>/step_N``).  orbax
      refuses a partial template against it, so this falls back to a full
      restore and extracts the params subtree (the one-time extra IO is the
      optimizer state, 2x params — acceptable on a load path).

    ``config``: when the extracted params are a LoRA fine-tune state
    (``{'base', 'lora'}`` — train with ``config.lora_rank > 0``), a config
    carrying the lora_* hyperparameters merges the adapters into dense
    weights so the model serves the fine-tuned weights directly.
    """
    import orbax.checkpoint as ocp
    path = Path(path).resolve()
    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            return ckptr.restore(path, item=template)
        except ValueError:
            full = ckptr.restore(path)     # trainer layout (or truly mismatched)
    if not (isinstance(full, dict) and 'params' in full):
        raise ValueError(
            f'{path} is neither a params checkpoint matching this model nor a '
            f"trainer step dir (top-level keys: {sorted(full)[:8]})")
    loaded = full['params']
    if isinstance(loaded, dict) and set(loaded) == {'base', 'lora'}:
        if config is None or int(getattr(config, 'lora_rank', 0)) <= 0:
            raise ValueError(
                f'{path} holds a LoRA fine-tune state; load it through a model '
                'whose config sets lora_rank/lora_alpha (or merge explicitly '
                'via valle2_tpu.lora.merge_lora)')
        from ..lora import lora_scale, merge_lora
        loaded = merge_lora(loaded['base'], loaded['lora'], lora_scale(config))
    import jax
    import jax.numpy as jnp
    # Map onto the template (enforces the structure; keeps template dtypes —
    # e.g. a param_dtype='bfloat16' model loading an f32-trained checkpoint).
    return jax.tree.map(lambda t, leaf: jnp.asarray(leaf, t.dtype),
                        template, loaded)
