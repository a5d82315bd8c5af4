"""Synthetic compositional grammar with deterministic 'acoustics' — the
generalization testbed.

`tests/test_e2e_loop.py` proves the train→synthesize loop can memorize ONE
utterance; this module exists to prove the framework trains models that work on
*unseen* inputs (the thing training infrastructure exists for — the reference
wires training at ``/root/reference/valle/train_model.py:13-35`` and claims ASR
in its README, but never demonstrates either).

Construction:

- **Grammar**: ``the <adj> <noun> <verb>.`` over lexicon words — |adj| x |noun|
  x |verb| compositional sentences.  A held-out split removes whole
  *combinations* while every individual word stays in training, so held-out
  success requires composition, not recall.
- **Acoustics**: each phoneme id maps to a fixed ``motif_len``-token first-
  codebook motif (affine in the id, injective mod the code vocab), and residual
  codebook q is a fixed pointwise shift of codebook 0.  The text→codes mapping
  is therefore exactly compositional: a model that learns phoneme→motif on the
  train split can be *correct* — not just plausible — on held-out sentences,
  which makes exact-match a meaningful metric.
- **Closed loop**: TTS (AR tokens→codes0, NAR codes0→codes1..7) and ASR
  (codes0→tokens) train from scratch on the train split; evaluation
  synthesizes held-out sentences with the TTS stack and transcribes the
  *synthesized* codes with the ASR stack back to text.

Run ``python examples/grammar_generalization.py`` for the measured numbers;
``tests/test_generalization.py`` gates a scaled-down version.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .frontend import PhonemeTokenizer

ADJECTIVES = ['good', 'old', 'new', 'big', 'small', 'quick', 'lazy', 'happy',
              'green', 'white']
NOUNS = ['dog', 'cat', 'bird', 'man', 'tree', 'house', 'road', 'river',
         'book', 'star']
VERBS = ['ran', 'fell', 'spoke', 'stood', 'played', 'jumped']


@dataclass(frozen=True)
class GrammarSpec:
    """Deterministic acoustics parameters (all mappings derive from these)."""
    num_audio_tokens: int = 256      # code vocabulary V (motifs are mod V)
    motif_len: int = 2               # codec frames per phoneme token
    stage_shift: int = 41            # codebook q = (codebook 0 + q*shift) % V
    num_quantizers: int = 8          # must match the model config's


def all_sentences() -> list[str]:
    return [f'the {a} {n} {v}.' for a in ADJECTIVES for n in NOUNS
            for v in VERBS]


def split_sentences(seed: int = 0, holdout_frac: float = 0.1
                    ) -> tuple[list[str], list[str]]:
    """Shuffled train/held-out split of the full combination set.  Every word
    appears in many training combinations (each adjective in |N|x|V|=60, etc.),
    so a 10% holdout cannot orphan a word — asserted anyway."""
    sents = all_sentences()
    rs = np.random.RandomState(seed)
    order = rs.permutation(len(sents))
    n_hold = max(1, int(len(sents) * holdout_frac))
    held = [sents[i] for i in order[:n_hold]]
    train = [sents[i] for i in order[n_hold:]]
    train_words = set(w for s in train for w in s.rstrip('.').split())
    held_words = set(w for s in held for w in s.rstrip('.').split())
    assert held_words <= train_words, 'holdout orphaned a word'
    return train, held


def synthesize_codes(token_ids: np.ndarray, spec: GrammarSpec) -> np.ndarray:
    """Phoneme ids (Tt,) → ground-truth codes (8, Tt*motif_len).

    Codebook 0: per token t, motif [(37t+11) % V, (53t+29) % V, ...] —
    multipliers coprime with any V so distinct ids get distinct motifs.
    Codebook q: (codebook0 + q*stage_shift) % V (pointwise, stage-separable).
    """
    v = spec.num_audio_tokens
    muls = (37, 53, 71, 89)[:spec.motif_len]
    adds = (11, 29, 43, 57)[:spec.motif_len]
    t = np.asarray(token_ids, np.int64)
    code0 = np.stack([(m * t + a) % v for m, a in zip(muls, adds)],
                     axis=1).reshape(-1)                      # (Tt*motif,)
    q = np.arange(spec.num_quantizers)[:, None]
    return ((code0[None, :] + q * spec.stage_shift) % v).astype(np.int32)


class GrammarDataset:
    """Dataset of grammar sentences in the standard item contract
    ({'codes': (nq, T), 'tokens': (Tt,)}) — drops into get_collate/DataLoader.

    ``n_pairs`` appends that many two-sentence concatenations (still fully
    compositional): they teach the continuation-after-prompt layout that
    cloning-prompt inference uses — a model trained only on single short
    sentences has never seen a code position past one sentence's length and
    EOSes immediately after a prompt."""

    def __init__(self, sentences: list[str], spec: GrammarSpec,
                 tokenizer: PhonemeTokenizer | None = None,
                 n_pairs: int = 0, pair_seed: int = 0):
        self.spec = spec
        self.tokenizer = tokenizer or PhonemeTokenizer(use_g2p=False)
        texts = list(sentences)
        if n_pairs:
            rs = np.random.RandomState(pair_seed)
            for _ in range(n_pairs):
                i, j = rs.randint(len(sentences), size=2)
                texts.append(sentences[i] + ' ' + sentences[j])
        self.items = []
        for s in texts:
            toks = self.tokenizer(s)
            self.items.append({'tokens': toks,
                               'codes': synthesize_codes(toks, spec),
                               'text': s})

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return {'tokens': self.items[i]['tokens'],
                'codes': self.items[i]['codes']}


# ---------------------------------------------------------------------------
# Closed-loop evaluation
# ---------------------------------------------------------------------------

def _token_acc(got: np.ndarray, want: np.ndarray) -> float:
    """Positional accuracy with length mismatch counted as error."""
    n = max(len(got), len(want))
    if n == 0:
        return 1.0
    m = min(len(got), len(want))
    return float((np.asarray(got[:m]) == np.asarray(want[:m])).sum()) / n


def evaluate_closed_loop(ar_tts, nar, ar_asr, sentences: list[str],
                         spec: GrammarSpec,
                         tokenizer: PhonemeTokenizer | None = None,
                         prompt_text: str | None = None) -> dict:
    """text → AR → NAR → (synthesized codes) → ASR → text on ``sentences``.

    ``prompt_text`` (a TRAIN-split sentence) plays the cloning prompt: its
    ground-truth codes form the acoustic prefix, exactly the BASELINE #4
    serving composition — and the layout the NAR trains on (prefix with all
    codebooks known).  ``None`` evaluates promptless.

    All decodes are greedy and batched (generate_batch).  Returns:
    tts_token_acc / tts_exact (codebook 0 vs ground truth), nar_token_acc
    (stages 1..7 on the SYNTHESIZED codes vs the shift rule applied to them),
    asr_token_acc / asr_exact (transcribed phoneme ids vs the input ids),
    text_exact (final round-trip string equality), n.
    """
    import jax.numpy as jnp

    tok = tokenizer or PhonemeTokenizer(use_g2p=False)
    nq = ar_tts.config.num_quantizers
    assert nq == spec.num_quantizers, \
        f'model num_quantizers {nq} != GrammarSpec.num_quantizers ' \
        f'{spec.num_quantizers} — ground truth and model codes would misalign'
    empty = np.zeros((0, nq), np.int32)
    token_lists = [tok(s) for s in sentences]
    truth = [synthesize_codes(t, spec) for t in token_lists]
    if prompt_text is not None:
        # Trailing space: tok(prompt + ' ') + tok(target) == tok(prompt ' ' target),
        # the exact stream a training pair produces.
        p_toks = tok(prompt_text + ' ')
        pcodes = np.ascontiguousarray(synthesize_codes(p_toks, spec).T)  # (Tp, nq)
    else:
        p_toks = np.zeros((0,), np.int32)
        pcodes = empty

    # TTS: AR first-codebook decode for all sentences in one on-device loop.
    # The generated region's ground truth is the TARGET tokens' motifs (the
    # mapping is per-token, so the prompt only changes the conditioning).
    gen0 = [np.asarray(g) for g in ar_tts.generate_batch(
        [jnp.asarray(np.concatenate([p_toks, t])) for t in token_lists],
        [pcodes] * len(sentences))]
    tts_acc = [_token_acc(g, tr[0]) for g, tr in zip(gen0, truth)]
    tts_exact = [len(g) == tr.shape[1] and np.array_equal(g, tr[0])
                 for g, tr in zip(gen0, truth)]

    # NAR refinement over the SYNTHESIZED first layer (the serving composition).
    nar_accs = []
    for t, g in zip(token_lists, gen0):
        if len(g) == 0:
            nar_accs.append(0.0)
            continue
        codes = np.asarray(nar.generate(jnp.asarray(p_toks), jnp.asarray(pcodes),
                                        jnp.asarray(t),
                                        jnp.asarray(g)))          # (T, nq)
        want = ((g[None, :] + np.arange(nq)[:, None] * spec.stage_shift)
                % spec.num_audio_tokens)                          # (nq, T)
        nar_accs.append(_token_acc(codes[:, 1:].T.reshape(-1), want[1:].reshape(-1)))

    # ASR on the synthesized codes — the closed loop's second half.
    asr_out = [np.asarray(o) for o in ar_asr.generate_batch(
        [jnp.asarray(g) for g in gen0], [empty] * len(sentences))]
    asr_acc = [_token_acc(o, t) for o, t in zip(asr_out, token_lists)]
    asr_exact = [len(o) == len(t) and np.array_equal(o, t)
                 for o, t in zip(asr_out, token_lists)]
    texts = [tok.to_text(o) for o in asr_out]
    text_exact = [got == want.rstrip('.').strip() or got == want
                  for got, want in zip(texts, sentences)]

    return {
        'n': len(sentences),
        'tts_token_acc': float(np.mean(tts_acc)),
        'tts_exact': float(np.mean(tts_exact)),
        'nar_token_acc': float(np.mean(nar_accs)),
        'asr_token_acc': float(np.mean(asr_acc)),
        'asr_exact': float(np.mean(asr_exact)),
        'text_exact': float(np.mean(text_exact)),
        'texts': texts,
    }


def default_config(spec: GrammarSpec, tokenizer: PhonemeTokenizer, **kw):
    """The grammar experiment's model scale (tiny: the task is compositional,
    not capacity-bound)."""
    from ..config import ConfigValle
    base = dict(d_model=64, n_heads=2, dim_feedforward=128, num_layers=2,
                vocab_size=tokenizer.vocab_size,
                num_audio_tokens=spec.num_audio_tokens,
                dropout=0.0, temperature=0.0, num_beams=1, max_audio_len=64,
                norm='AdaptiveLayerNorm', bucket_sizes=(32, 64, 96), lr=2e-3,
                schedule='constant', batch_size=32)
    base.update(kw)
    return ConfigValle(**base)


def train_grammar_model(model_name: str, config, train_ds: GrammarDataset,
                        valid_ds: GrammarDataset | None = None,
                        max_epochs: int = 60, loss_target: float = 5e-3,
                        seed: int = 0, base_params=None):
    """Train one model on the grammar through the production data path
    (get_collate → DataLoader → jitted train step).  Returns
    (params, curves) where curves = {'train_loss': [...per epoch],
    'valid_loss': [...]} — the val-tracks-train evidence.

    ``base_params``: start from these weights (with ``config.lora_rank > 0``
    this is a LoRA fine-tune — returned params are the ``{'base', 'lora'}``
    state; merge via ``lora.merged`` to serve)."""
    import jax
    import jax.numpy as jnp

    from ..train import init_state, make_eval_step, make_train_step
    from .collate import get_collate
    from .dataset import DataLoader

    collate = get_collate(model_name)(config)
    loader = DataLoader(train_ds, config.batch_size, collate, shuffle=True,
                        seed=seed)
    valid_batch = None
    if valid_ds is not None:
        vloader = DataLoader(valid_ds, min(len(valid_ds), 64), collate,
                             shuffle=False, drop_last=False)
        valid_batch = jax.tree.map(jnp.asarray, next(iter(vloader)))
    state = init_state(config, model_name, jax.random.key(seed),
                       base_params=base_params)
    step_fn = make_train_step(config, model_name)
    eval_fn = make_eval_step(config, model_name)
    rng = jax.random.key(seed + 1)
    curves: dict[str, list[float]] = {'train_loss': [], 'valid_loss': []}
    for _epoch in range(max_epochs):
        m = None
        for batch in loader:
            batch = jax.tree.map(jnp.asarray, batch)
            state, m = step_fn(state, batch, rng)
        if m is None:
            # drop_last + a dataset smaller than batch_size yields ZERO
            # batches — fail with the cause, not a NoneType crash.
            raise ValueError(
                f'train dataset ({len(train_ds)} items) produced no batches '
                f'at batch_size={config.batch_size}; shrink batch_size or '
                f'grow the grammar')
        curves['train_loss'].append(float(m['loss']))
        if valid_batch is not None:
            vm = eval_fn(state.params, valid_batch, jax.random.fold_in(rng, _epoch))
            curves['valid_loss'].append(float(vm['loss']))
        if curves['train_loss'][-1] < loss_target:
            break
    return state.params, curves
