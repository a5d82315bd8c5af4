"""Continuous batching for the AR decode: concurrent sessions share ONE
batched decode program, each row at its own depth.

The serving problem this solves: N concurrent streaming sessions each drive
their own batch-1 ``DecodeStream`` — the device runs N small programs
back-to-back, so aggregate token throughput is ~1/N of what the SAME weights
read once per step could produce (decode is weight/cache-bandwidth bound;
the weight reads amortize across rows for free).  Continuous batching keeps
one (rows = n_slots) decode loop resident and lets sessions JOIN a free row
mid-flight (prefill → insert) and LEAVE when they hit EOS — the standard
production-serving design (vLLM-style), built here from the same primitives
as the batched decode: per-row lengths were always masked per row
(``ar._decode_prefill``), so the only new machinery is a per-row *decode
position* (``ops.transformer.transformer_decode_step`` accepts an index
vector) and per-row codes-buffer writes.

No reference counterpart: the reference's inference is a host-driven batch-1
Python loop (``/root/reference/valle/models/valle_ar.py:141-171``).

Semantics:

- All slots share one static geometry (ttm, pm, max_audio_len) — prompts pad
  up to it, masks make the padding invisible (same invariant the batched
  decode relies on).  One compiled program serves every occupancy.
- **Tokens are bit-identical to the solo decode — greedy AND sampled** — for
  every session regardless of join order / co-tenants (tested,
  tests/test_continuous.py).  Each row carries its own rng chain (seeded by
  ``join(rng=…)``) and consumes exactly the solo stream's split-per-step
  sequence while active, so even temperature>0 sessions reproduce their solo
  draws — a determinism property dynamic batchers usually give up.
- A finished (or empty) row is an exact no-op: its sampled token is forced
  EOS, its step does not advance, its statistics freeze.  Its cache row does
  keep absorbing the frozen position's k/v write (a dynamic_update_slice must
  write somewhere) — harmless: only the row itself attends those slots, and
  its outputs are discarded; a reused slot is fully overwritten at insert.
"""

from __future__ import annotations

import threading
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigValle
from ..ops import (KVCache, embedding, linear, sinusoidal_table,
                   topk_sampling, transformer_decode_step)
from ..ops.masks import NEG_INF
from .ar import (MAX_POS, DecodeState, ValleAR, _dims, _ngram_draft,
                 _spec_gate, _specials, _to_compute)

Params = dict[str, Any]

__all__ = ['ContinuousDecoder', 'BatcherFull']


class BatcherFull(RuntimeError):
    """Raised by ``ContinuousDecoder.join`` when no slot is free."""


def _cb_advance(params: Params, state: DecodeState, tl_f: jax.Array,
                pl_f: jax.Array, k: jax.Array, config: ConfigValle,
                ttm: int, pm: int) -> DecodeState:
    """Advance every ACTIVE row by up to ``k`` tokens (traced scalar — one
    compilation serves any segment length).  ``state.step`` is a (rows,)
    vector: rows sit at different decode depths.  Mirrors
    ``ar._decode_advance``'s one_step with the scalar step/index replaced by
    per-row vectors; finished and empty rows are exact no-ops."""
    eos, _ = _specials(config)
    max_new = config.max_audio_len
    # Head-major (L, rows, S, d) cache means the joint state runs the fused
    # whole-stack Pallas kernel (per-row index variant); 5-D means the XLA
    # path (same convention as ar._decode_advance).
    use_fused = state.cache.k.ndim == 4
    rows = state.cache.k.shape[1]
    total_max = state.cache.k.shape[2] if use_fused else state.cache.k.shape[3]
    n_heads = config.n_heads
    pe = sinusoidal_table(MAX_POS, config.d_model)
    dtype = jnp.dtype(config.dtype)
    tparams = jax.tree.map(_to_compute(dtype), params['transformer'])

    slots = jnp.arange(total_max)[None, :]
    base_valid = ((slots < tl_f[:, None])
                  | ((slots >= ttm) & (slots < ttm + pl_f[:, None])))
    width = state.codes.shape[1]
    cols = jnp.arange(width)[None, :]

    def one_step(s: DecodeState) -> DecodeState:
        steps = s.step                                    # (rows,) int32
        active = (~s.finished) & (steps < max_new)
        # PER-ROW rng chains (s.rng is a (rows,) key vector): each session
        # consumes exactly the split-per-step sequence its solo DecodeStream
        # would, and only while it is active — so SAMPLED sessions emit
        # bit-identical tokens to their solo decode regardless of join order
        # or co-tenants, same as greedy (tests/test_continuous.py).  Inactive
        # rows' chains freeze (a solo stream stops splitting when it exits).
        keys = jax.vmap(lambda kk: jax.random.split(kk, 2))(s.rng)
        rng_next = jnp.where(active, keys[:, 0], s.rng)

        def one_row_sample(kk, lg):
            smp, lp = topk_sampling(kk, lg[None], top_k=config.top_k,
                                    tok_p=config.tok_p,
                                    temperature=config.temperature)
            return smp[0], lp[0]

        samples, logprobs = jax.vmap(one_row_sample)(keys[:, 1], s.logits)
        sum_logprobs = s.sum_logprobs + logprobs * active
        samples = jnp.where(active, samples.astype(jnp.int32), eos)
        if config.ignore_eos:    # benchmarking: fixed-length decode (ar.py parity)
            finished = s.finished | ~active
        else:
            finished = s.finished | (samples == eos) | ~active
        # Per-row codes write at column pm + steps (elementwise mask — the
        # buffer is a tiny int32 plane, a (rows, width) where is ~free).
        colmask = (cols == (pm + steps)[:, None]) & active[:, None]
        codes_new = jnp.where(colmask, samples[:, None], s.codes)
        x = embedding(params['audio_emb'], samples[:, None])
        x = (x + jnp.take(pe, pl_f + steps, axis=0)[:, None]).astype(dtype)
        write_idx = ttm + pm + steps                      # (rows,)
        if use_fused:
            from ..kernels.fused_decode import fused_decode_step
            y, cache = fused_decode_step(
                tparams, x, n_heads, s.cache, write_idx, tl_f, pl_f, ttm, pm,
                chunk_override=config.decode_chunk or None)
        else:
            attend = base_valid | ((slots >= ttm + pm)
                                   & (slots <= write_idx[:, None]))
            y, cache = transformer_decode_step(
                tparams, x, n_heads, s.cache, write_idx, attend_mask=attend,
                attn_buckets=config.decode_attn_buckets)
        logits = linear(params['proj'], y[:, 0].astype(jnp.float32))
        # Inactive rows keep their carried logits: a frozen (pending) row's
        # prefill logits determine its FIRST token after activation — letting
        # the forced-EOS feedback clobber them would corrupt the stream.
        # (Finished rows' logits are discarded anyway; the where is ~free.)
        logits = jnp.where(active[:, None], logits, s.logits)
        return DecodeState(steps + active, codes_new, logits, cache,
                           sum_logprobs, finished, rng_next)

    unroll = max(1, config.decode_unroll)

    def cond(carry):
        i, s = carry
        return (i < k) & jnp.any((~s.finished) & (s.step < max_new))

    def body(carry):
        i, s = carry
        for _ in range(unroll):      # straight-line steps amortize loop-turn cost
            s = one_step(s)
        return i + unroll, s

    _, final = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return final


def _cb_advance_spec(params: Params, state: DecodeState, tl_f: jax.Array,
                     pl_f: jax.Array, turns: jax.Array, config: ConfigValle,
                     ttm: int, pm: int) -> DecodeState:
    """Speculative continuous batching: advance every ACTIVE row by up to
    ``turns`` verify turns, each committing 1..K tokens (traced scalar — one
    compilation serves any cadence).

    The turn body mirrors ``ar._decode_advance_spec`` (n-gram drafting, one
    K-token verify pass — the fused q-block Pallas kernel under the fused
    gate, whose per-row write indices exist for exactly this: rows advance by
    different amounts per turn — greedy commit-iff-argmax, sampled exact
    rejection sampling with a forced one-hot carry), with the continuous-
    batching deltas of ``_cb_advance``:

    - PER-ROW rng chains: each row splits its own key 4 ways per turn,
      consuming exactly the sequence its SOLO speculative decode would — so
      sampled sessions commit bit-identical tokens to their solo spec decode
      (and greedy to the plain loop, since greedy speculation is
      bit-identical to plain greedy), independent of join order / co-tenants
      / slot reuse.  Inactive rows' chains freeze.
    - Frozen (pending / finished / released) rows are exact no-ops: zero
      commit length, carried logits preserved (a pending row's prefill
      logits determine its first token after activation), statistics frozen.
      Their verify pass still writes K stale kv slots at [step, step+K) —
      harmless, as in ``_cb_advance``: the in-flight block is excluded from
      cache reads (served from registers), only the row itself could attend
      those slots, and activation/next-turn rewrites them (the cache carries
      K slots of slack past max_new for exactly this idle write — same slack
      ``ar._decode_prefill`` adds).
    """
    eos, _ = _specials(config)
    max_new = config.max_audio_len
    k_blk = config.speculative_k
    use_fused = state.cache.k.ndim == 4
    rows = state.codes.shape[0]
    total_max = state.cache.k.shape[2] if use_fused else state.cache.k.shape[3]
    n_heads = config.n_heads
    pe = sinusoidal_table(MAX_POS, config.d_model)
    dtype = jnp.dtype(config.dtype)
    tparams = jax.tree.map(_to_compute(dtype), params['transformer'])

    slots = jnp.arange(total_max)[None, :]
    base_valid = ((slots < tl_f[:, None])
                  | ((slots >= ttm) & (slots < ttm + pl_f[:, None])))
    sampled = bool(config.temperature and config.temperature > 0.0)
    temp = float(config.temperature) if sampled else 1.0

    def one_row_sample(kk, lg):
        smp, lp = topk_sampling(kk, lg[None], top_k=config.top_k,
                                tok_p=config.tok_p,
                                temperature=config.temperature)
        return smp[0], lp[0]

    def turn(s: DecodeState) -> DecodeState:
        alive = (~s.finished) & (s.step < max_new)
        # 4-way split PER ROW, same unpack order as the solo loop (next
        # chain, t0 draw, acceptance, residual) — an active row's chain
        # consumes exactly what its solo spec decode consumes per turn.
        keys = jax.vmap(lambda kk: jax.random.split(kk, 4))(s.rng)
        rng_next = jnp.where(alive, keys[:, 0], s.rng)
        t0, lp0 = jax.vmap(one_row_sample)(keys[:, 1], s.logits)
        t0 = jnp.where(alive, t0.astype(jnp.int32), eos)
        codes_t0 = jax.vmap(lambda row, v, i: jax.lax.dynamic_update_slice(
            row, v[None], (i,)))(s.codes, t0, pm + s.step)
        draft = _ngram_draft(codes_t0, pm + s.step + 1,
                             config.speculative_ngram, k_blk - 1, t0)
        block = jnp.concatenate([t0[:, None], draft], axis=1)       # (rows, K)

        pos = pl_f[:, None] + s.step[:, None] + jnp.arange(k_blk)[None, :]
        x = embedding(params['audio_emb'], block)
        x = (x + jnp.take(pe, pos, axis=0)).astype(dtype)
        write_idx = ttm + pm + s.step                                # (rows,)
        if use_fused:
            from ..kernels.fused_decode import fused_verify_step
            y, cache = fused_verify_step(
                tparams, x, n_heads, s.cache, write_idx, tl_f, pl_f, ttm, pm,
                chunk_override=config.decode_chunk or None)
        else:
            qi = jnp.arange(k_blk)[None, :, None]
            attend = (base_valid[:, None, :]
                      | ((slots[:, None, :] >= ttm + pm)
                         & (slots[:, None, :] <= write_idx[:, None, None] + qi)))
            y, cache = transformer_decode_step(
                tparams, x, n_heads, s.cache, write_idx, attend_mask=attend,
                attn_buckets=config.decode_attn_buckets)
        flat3 = linear(params['proj'],
                       y.astype(jnp.float32)).reshape(rows, k_blk, -1)
        vocab = flat3.shape[-1]

        if not sampled:
            # Greedy acceptance: draft == the model's own argmax there
            # (per-row keys are ignored by greedy topk_sampling — bit parity
            # with the solo loop is rng-independent).
            g_tok, g_lp = jax.vmap(
                lambda kk, lg: topk_sampling(kk, lg, top_k=config.top_k,
                                             tok_p=config.tok_p,
                                             temperature=config.temperature)
            )(keys[:, 2], flat3)
            g_tok = g_tok.astype(jnp.int32)                      # (rows, K)
            match = (block[:, 1:] == g_tok[:, :-1]).astype(jnp.int32)
            lp_blk = jnp.concatenate([lp0[:, None], g_lp[:, :-1]], axis=1)
        else:
            # Exact rejection sampling for the point-mass draft, per row
            # (solo semantics; ar._decode_advance_spec for the math).
            from ..ops.sampling import top_k_top_p_filter
            filt = top_k_top_p_filter(flat3 / temp, config.top_k,
                                      config.tok_p)              # (r, K, V)
            logp = jax.nn.log_softmax(filt, axis=-1)
            lp_draft = jnp.take_along_axis(
                logp[:, :-1], block[:, 1:, None], axis=-1)[..., 0]  # (r, K-1)
            u = jax.vmap(lambda kk: jax.random.uniform(kk, (k_blk - 1,)))(
                keys[:, 2])
            match = (jnp.log(u) < lp_draft).astype(jnp.int32)
            lp_blk = jnp.concatenate([lp0[:, None], lp_draft], axis=1)
        c_acc = jnp.cumprod(match, axis=1).sum(axis=1) + 1           # 1..K

        c = c_acc
        if not config.ignore_eos:
            is_eos = block == eos
            first_eos = jnp.argmax(is_eos, axis=1)
            c = jnp.where(jnp.any(is_eos, axis=1),
                          jnp.minimum(c, first_eos + 1), c)
        c = jnp.where(alive, jnp.minimum(c, max_new - s.step), 0)
        take = jnp.arange(k_blk)[None, :] < c[:, None]

        sum_logprobs = s.sum_logprobs + jnp.sum(lp_blk * take, axis=1)
        codes_new = jax.vmap(lambda row, vals, i: jax.lax.dynamic_update_slice(
            row, vals, (i,)))(s.codes, jnp.where(take, block, eos), pm + s.step)
        step_new = s.step + c
        finished = s.finished | (step_new >= max_new)
        if not config.ignore_eos:
            committed_eos = jnp.any((block == eos) & take, axis=1)
            finished = finished | committed_eos
        ci = jnp.clip(c - 1, 0, k_blk - 1)[:, None, None]
        logits_next = jnp.take_along_axis(flat3, ci, axis=1)[:, 0]
        # c == 0 covers frozen rows too: a pending row's carried prefill
        # logits must survive until activation (same rule as _cb_advance).
        logits_next = jnp.where((c > 0)[:, None], logits_next, s.logits)

        if sampled:
            # Residual resample at the first rejection; commits via a forced
            # one-hot carry next turn (ar._decode_advance_spec for why).
            prev = jnp.clip(c_acc - 1, 0, k_blk - 1)
            filt_prev = jnp.take_along_axis(
                filt, prev[:, None, None], axis=1)[:, 0]         # (rows, V)
            d_rej = jnp.take_along_axis(
                block, jnp.clip(c_acc, 0, k_blk - 1)[:, None], axis=1)[:, 0]
            resid = jnp.where(jnp.arange(vocab)[None, :] == d_rej[:, None],
                              NEG_INF, filt_prev)
            x_new = jax.vmap(jax.random.categorical)(keys[:, 3], resid) \
                .astype(jnp.int32)
            lp_new = jnp.take_along_axis(
                jnp.take_along_axis(logp, prev[:, None, None], axis=1)[:, 0],
                x_new[:, None], axis=1)[:, 0]
            do_force = alive & (c_acc < k_blk) & (c == c_acc) & ~finished
            sum_logprobs = sum_logprobs + jnp.where(do_force, lp_new, 0.0)
            force_row = jnp.where(jnp.arange(vocab)[None, :] == x_new[:, None],
                                  0.0, NEG_INF)
            logits_next = jnp.where(do_force[:, None], force_row, logits_next)

        return DecodeState(step_new, codes_new, logits_next, cache,
                           sum_logprobs, finished, rng_next)

    def cond(carry):
        i, s = carry
        return (i < turns) & jnp.any((~s.finished) & (s.step < max_new))

    _, final = jax.lax.while_loop(cond, lambda c: (c[0] + 1, turn(c[1])),
                                  (jnp.int32(0), state))
    return final


def _cb_insert(state: DecodeState, tl_f: jax.Array, pl_f: jax.Array,
               row: DecodeState, row_tl: jax.Array, row_pl: jax.Array,
               slot: jax.Array):
    """Write a freshly prefilled single-session state into joint row ``slot``
    (traced scalar — one compilation serves every slot).  The row's cache is
    (L, 1, h, S, hd) from the SAME geometry prefill, so every leaf is one
    ``dynamic_update_slice`` along the rows axis."""
    zero = jnp.int32(0)
    slot = jnp.int32(slot)
    cache = jax.tree.map(
        lambda joint, one: jax.lax.dynamic_update_slice(
            joint, one, (zero, slot) + (zero,) * (joint.ndim - 2)),
        state.cache, row.cache)
    codes = jax.lax.dynamic_update_slice(state.codes, row.codes, (slot, zero))
    logits = jax.lax.dynamic_update_slice(state.logits, row.logits,
                                          (slot, zero))
    # Adopt the session's OWN rng chain (the prefill stores the caller key):
    # sampled decode then draws exactly what the solo stream would.
    rng = state.rng.at[slot].set(row.rng)
    new_state = DecodeState(
        step=state.step.at[slot].set(0),
        codes=codes, logits=logits, cache=cache,
        sum_logprobs=state.sum_logprobs.at[slot].set(0.0),
        # Inserted FROZEN (finished=True): the row must not advance until the
        # host activates it — a pending row that decodes invisibly delivers a
        # multi-chunk token burst at activation, which desynchronizes the
        # session's chunk cadence from the solo streaming path (the hub's
        # parity surface: emission/refinement depths must match solo).
        finished=state.finished.at[slot].set(True),
        rng=rng)
    return (new_state, tl_f.at[slot].set(row_tl[0]),
            pl_f.at[slot].set(row_pl[0]))


def _cb_finish(state: DecodeState, slot: jax.Array) -> DecodeState:
    """Force-finish a row (session released/aborted before EOS)."""
    return state._replace(finished=state.finished.at[jnp.int32(slot)].set(True))


def _cb_start(state: DecodeState, slot: jax.Array) -> DecodeState:
    """Un-freeze a freshly inserted row (see _cb_insert: rows insert frozen)."""
    return state._replace(finished=state.finished.at[jnp.int32(slot)].set(False))


class ContinuousDecoder:
    """Host-side slot manager over the continuous-batching decode loop.

    ``join`` prefills a session and claims a free row; ``advance(k)`` steps
    every live session up to ``k`` tokens in ONE device program and returns
    the newly generated first-codebook ids per slot; ``release`` frees a row
    for the next session.  Thread-safe (one lock around the device state —
    callers like serve.TTSServer drive it from several request threads).

    ``model``: a ValleAR (its params are shared; a num_beams=1 sibling config
    drives the loop — prefill runs unfused at rows=1, and the JOINT loop
    takes the fused whole-stack Pallas kernel when the caller's
    ``use_fused_decode`` gate passes at the joint geometry, via the kernel's
    per-row index variant).
    ``n_slots``: rows in the joint state (compiled size — pick the expected
    peak concurrency).  ``ttm``/``pm``: shared prompt geometry (token / code
    slots) — size it to the prompt distribution; prompts that exceed it are
    rejected at ``join`` (route those to a solo DecodeStream).  Defaults to
    the smallest ``config.bucket_sizes`` bucket (128 by default — a ~1.7 s
    acoustic prompt; the largest bucket would triple every row's cache for
    headroom most sessions never use).
    ``speculative``: opt-in n-gram speculative decoding for the joint loop
    (requires ``config.speculative_k >= 2``) — each ``advance(k)`` runs up
    to ``k`` verify turns committing 1..K tokens per row per turn
    (``_cb_advance_spec``).  Greedy sessions stay bit-identical to their
    solo decode; sampled sessions are bit-identical to their solo
    SPECULATIVE decode (same per-row chain), which is distribution-exact
    vs plain sampling.
    """

    def __init__(self, model: ValleAR, n_slots: int = 4,
                 ttm: int | None = None, pm: int | None = None,
                 rng: jax.Array | None = None, speculative: bool = False):
        import dataclasses
        config = model.config
        if config.num_beams != 1:
            raise ValueError('continuous batching requires num_beams == 1')
        if n_slots < 1:
            raise ValueError(f'n_slots must be >= 1, got {n_slots}')
        self._spec = bool(speculative)
        if self._spec:
            # Speculative continuous batching (_cb_advance_spec): the joint
            # loop runs n-gram verify turns; geometry gains the same K-slot
            # slack the solo spec prefill adds.  Opt-in (not inferred from
            # the model config): a verify turn commits 1..K tokens, so
            # ``advance(k)`` becomes turn-bounded rather than token-bounded —
            # callers pacing emission by token count should opt in knowingly.
            cfg = dataclasses.replace(config, num_beams=1,
                                      use_fused_decode=False)
            if not _spec_gate(cfg):       # validates; False = k < 2 (off)
                raise ValueError('speculative=True requires '
                                 'config.speculative_k >= 2')
        else:
            # speculative_k=0: the plain joint loop advances one token per
            # row per step, and a spec-enabled config would make the rows=1
            # prefill pad its cache K slots longer than the joint geometry
            # computed below — the row insert would not fit.
            cfg = dataclasses.replace(config, num_beams=1,
                                      use_fused_decode=False,
                                      speculative_k=0)
        self._ar = ValleAR(cfg, params=model.params)
        # Share any quantized decode view instead of re-quantizing a duplicate.
        if config.weight_dtype in ('int8', 'int4'):
            self._ar._qdecode = model.decode_params
            self._ar._qdecode_src = (self._ar.params,
                                     self._ar.params['transformer'])
        self.config = cfg
        self.n_slots = n_slots
        self.ttm = int(ttm if ttm is not None else min(config.bucket_sizes))
        self.pm = int(pm if pm is not None else min(config.bucket_sizes))
        self.eos = self._ar.eos_token
        self.max_new = cfg.max_audio_len

        unroll = max(1, cfg.decode_unroll)
        max_new_pad = -(-self.max_new // unroll) * unroll
        if self._spec:
            # Same slack ar._decode_prefill adds: finished rows idling while
            # others decode write K slots from position max_new (the row
            # prefill uses this exact formula, so insert widths match).
            max_new_pad += cfg.speculative_k
        total_max = self.ttm + self.pm + max_new_pad
        width = self.pm + max_new_pad
        from .ar import check_max_pos
        check_max_pos(self.ttm, width, 'continuous-batching hub')
        cache_dtype = jnp.dtype(cfg.kv_cache_dtype)
        # Fused whole-stack kernel: gate on the CALLER's preference at the
        # JOINT geometry (rows = n_slots decides VMEM fit and chunking — the
        # prefill always runs unfused at rows=1 and its standard-layout row is
        # converted on insert).
        import dataclasses as _dc
        from .ar import _fused_gate
        from ..kernels.fused_decode import chunk_for, fused_cache_layout
        gate_cfg = _dc.replace(cfg, use_fused_decode=config.use_fused_decode)
        self._use_fused = _fused_gate(gate_cfg, n_slots, total_max)
        if self._use_fused:
            # Pad the cache length to a fixed point of the kernel's own chunk
            # derivation (same loop as ar._decode_prefill).
            for _ in range(3):
                chunk_est = chunk_for(total_max, n_slots, cfg.d_model,
                                      cfg.n_heads, cache_dtype,
                                      forced=cfg.decode_chunk or None)
                if chunk_est >= total_max or total_max % chunk_est == 0:
                    break
                total_max = -(-total_max // chunk_est) * chunk_est
            d = cfg.d_model
            shape = (cfg.num_layers, n_slots, total_max, d)
            if cache_dtype == jnp.int8:
                scale_shape = (cfg.num_layers, n_slots, total_max, cfg.n_heads)
                cache = KVCache(jnp.zeros(shape, jnp.int8),
                                jnp.zeros(shape, jnp.int8),
                                jnp.zeros(scale_shape, jnp.bfloat16),
                                jnp.zeros(scale_shape, jnp.bfloat16))
            else:
                cache = KVCache(jnp.zeros(shape, cache_dtype),
                                jnp.zeros(shape, cache_dtype))
        else:
            # Same element dtype the prefill writes (ar._decode_prefill passes
            # config.kv_cache_dtype through transformer_prefill).
            cache = KVCache.zeros(cfg.num_layers, n_slots, cfg.n_heads,
                                  total_max, cfg.head_dim, cache_dtype)
        self._to_fused_layout = fused_cache_layout
        _, tgt_vocab = _dims(cfg)
        if rng is None:
            rng = jax.random.key(cfg.seed)
        self._state = DecodeState(
            step=jnp.zeros((n_slots,), jnp.int32),
            codes=jnp.full((n_slots, width), self.eos, jnp.int32),
            logits=jnp.zeros((n_slots, tgt_vocab - 1), jnp.float32),
            cache=cache,
            sum_logprobs=jnp.zeros((n_slots,), jnp.float32),
            finished=jnp.ones((n_slots,), bool),
            # (rows,) PER-ROW key chains; each insert overwrites its slot with
            # the session's own key (solo sampling parity — see _cb_advance).
            rng=jax.random.split(jnp.asarray(rng), n_slots))
        self._tl = jnp.zeros((n_slots,), jnp.int32)
        self._pl = jnp.zeros((n_slots,), jnp.int32)

        from ..aot import cached_jit, config_key
        ck = config_key(cfg) + f'|cb{n_slots}x{self.ttm}x{self.pm}'
        prec = cfg.matmul_precision

        advance_fn = _cb_advance_spec if self._spec else _cb_advance

        def _advance_wrapped(p, state, tl, pl, k):
            with jax.default_matmul_precision(prec):
                return advance_fn(p, state, tl, pl, k, cfg, self.ttm, self.pm)

        self._advance_jit = cached_jit(
            _advance_wrapped, tag='cb_advance_spec' if self._spec
            else 'cb_advance', extra_key=ck, donate_argnums=(1,))
        self._insert_jit = cached_jit(_cb_insert, tag='cb_insert',
                                      extra_key=ck, donate_argnums=(0, 1, 2))
        self._finish_jit = cached_jit(_cb_finish, tag='cb_finish',
                                      extra_key=ck, donate_argnums=(0,))
        self._start_jit = cached_jit(_cb_start, tag='cb_start',
                                     extra_key=ck, donate_argnums=(0,))
        self._lock = threading.Lock()
        # Host bookkeeping per slot: None = free; else dict(emitted=…).
        self._sessions: list[dict | None] = [None] * n_slots

    # -- session lifecycle -------------------------------------------------

    def free_slots(self) -> int:
        with self._lock:
            return sum(s is None for s in self._sessions)

    def join(self, tokens, prompt_codes, start: bool = True,
             rng: jax.Array | None = None, tag: Any = None) -> int:
        """Prefill a session (tokens: (Tt,) source ids incl. target text;
        prompt_codes: (Tp, num_quantizers)) and claim a free slot.  Returns
        the slot id; raises BatcherFull when every row is occupied, and
        ValueError when the prompt exceeds the shared geometry.

        ``rng`` seeds this session's PER-ROW sampling chain (default
        ``key(config.seed)``): sampled decode draws exactly what a solo
        ``DecodeStream`` seeded with the same key would, so outputs are
        bit-identical to the solo path for greedy AND sampled decode,
        independent of join order and co-tenants.

        ``tag``: opaque caller identity returned by ``advance(tags=True)`` —
        lets a driver route output to the session object that owned the row
        DURING the advance, immune to release/re-join races on the slot id.

        The slot is *pending* (invisible to ``advance``) from claim until the
        row insert lands — a concurrent ``advance`` must neither read the
        previous occupant's finished device row as this session's state nor
        deliver tokens before the caller is ready to receive them.  With
        ``start=False`` the slot STAYS pending after ``join`` returns until
        ``activate(slot)``: callers that route tokens by slot id (StreamHub)
        need the id registered with their consumer before the first tokens
        can be attributed to it."""
        tokens = np.asarray(tokens, np.int32).reshape(-1)
        pcodes = np.asarray(prompt_codes, np.int32).reshape(
            -1, self.config.num_quantizers)
        codes0 = np.concatenate([[self._ar.bos_token], pcodes[:, 0]]) \
            .astype(np.int32)
        if len(tokens) > self.ttm:
            raise ValueError(f'prompt tokens ({len(tokens)}) exceed the '
                             f'batcher geometry ttm={self.ttm}')
        if len(codes0) > self.pm:
            raise ValueError(f'prompt codes ({len(codes0) - 1}) exceed the '
                             f'batcher geometry pm={self.pm - 1}')
        tokens_pad = jnp.asarray(np.pad(tokens, (0, self.ttm - len(tokens))))[None]
        codes_pad = jnp.asarray(np.pad(codes0, (0, self.pm - len(codes0))))[None]
        with self._lock:
            slot = next((i for i, s in enumerate(self._sessions) if s is None),
                        None)
            if slot is None:
                raise BatcherFull(f'all {self.n_slots} slots busy')
            self._sessions[slot] = {'emitted': 0, 'finished': False,
                                    'pending': True, 'tag': tag}
        try:
            # The prefill STORES the rng; _cb_insert adopts it as this row's
            # sampling chain (self._state leaves must not be read outside the
            # lock — advance donates them).
            if rng is None:
                rng = jax.random.key(self.config.seed)
            row, row_tl, row_pl = self._ar._prefill_jit(
                self._ar.decode_params, tokens_pad,
                jnp.asarray([len(tokens)], jnp.int32), codes_pad,
                jnp.asarray([len(codes0)], jnp.int32),
                jnp.asarray(rng))
            if self._use_fused:
                # Prefill runs unfused (rows=1): convert its standard-layout
                # cache row to the joint head-major layout.  The row's cache
                # may be SHORTER than the (chunk-padded) joint length — the
                # insert writes [0, S_row) and the tail slots past the row's
                # write index are never attended (masked by the per-row
                # formula) nor fetched (the chunk clamp follows real depths).
                row = row._replace(cache=self._to_fused_layout(row.cache))
            with self._lock:
                self._state, self._tl, self._pl = self._insert_jit(
                    self._state, self._tl, self._pl, row, row_tl, row_pl,
                    jnp.int32(slot))
        except Exception:
            with self._lock:
                self._sessions[slot] = None
            raise
        if start:
            self.activate(slot)
        return slot

    def activate(self, slot: int) -> None:
        """Make a ``join(start=False)`` slot live.  Pending rows are frozen on
        DEVICE too (inserted finished=True), so the session's first delivery
        is its first ``advance`` segment — never a multi-chunk burst decoded
        invisibly between insert and activation (that would desynchronize the
        chunk cadence from the solo streaming path, StreamHub's parity
        surface)."""
        with self._lock:
            sess = self._sessions[slot]
            if sess is None:
                raise KeyError(f'slot {slot} is not occupied')
            self._state = self._start_jit(self._state, jnp.int32(slot))
            sess['pending'] = False

    def advance(self, k: int, tags: bool = False):
        """One joint device step of up to ``k`` tokens for every live row
        (``speculative=True``: up to ``k`` verify TURNS, each committing
        1..speculative_k tokens per row).

        Returns {slot: newly generated ids (EOS stripped)} for every occupied
        slot that produced tokens or just finished; consult ``finished(slot)``
        afterwards.  With ``tags=True``, returns {slot: (tag, ids, done)} —
        the join-time tag plus this slot's doneness CAPTURED UNDER THE LOCK,
        so a driver routing after the call cannot confuse a released/re-joined
        slot's new occupant with the session that decoded these tokens.
        No-op (empty dict) when nothing is live."""
        with self._lock:
            live = [i for i, s in enumerate(self._sessions)
                    if s is not None and not s['finished']
                    and not s['pending']]
            if not live:
                return {}
            self._state = self._advance_jit(
                self._ar.decode_params, self._state, self._tl, self._pl,
                jnp.int32(k))
            steps = np.asarray(self._state.step)
            fin = np.asarray(self._state.finished)
            codes = np.asarray(self._state.codes)
            out: dict = {}
            for slot in live:
                sess = self._sessions[slot]
                row = codes[slot, self.pm + sess['emitted']:
                            self.pm + int(steps[slot])]
                sess['emitted'] = int(steps[slot])
                done = bool(fin[slot]) or int(steps[slot]) >= self.max_new
                sess['finished'] = done
                new = row[row != self.eos]
                if len(new) or done:
                    out[slot] = (sess['tag'], new, done) if tags else new
            return out

    def finished(self, slot: int) -> bool:
        with self._lock:
            sess = self._sessions[slot]
            if sess is None:
                raise KeyError(f'slot {slot} is not occupied')
            return sess['finished']

    def release(self, slot: int) -> None:
        """Free a row (idempotent).  Safe mid-decode: the row is force-
        finished on device so the loop stops advancing it.  The host-side
        free happens even if the device call fails (a dead device must not
        leak slots into permanent BatcherFull)."""
        with self._lock:
            if self._sessions[slot] is None:
                return
            try:
                self._state = self._finish_jit(self._state, jnp.int32(slot))
            finally:
                self._sessions[slot] = None
