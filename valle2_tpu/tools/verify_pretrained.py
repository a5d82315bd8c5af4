"""One-command pretrained-artifact gate (BASELINE config #1).

Every in-repo parity claim routes through builder-written torch mirrors because
this image has no network; the real pip EnCodec weights
(``/root/reference/valle/models/encodec_pip.py:13-16``) have never touched this
code.  On the day a real checkpoint IS available, this tool is the drop-in gate::

    python -m valle2_tpu.tools.verify_pretrained --codec encodec_24khz.th \
        [--ar ar.ckpt --nar nar.ckpt -c config.json]

It converts the torch checkpoint (codec/convert.py), loads the SAME state dict
into an independent torch implementation, and runs the full
``TestFullStackTorchParity`` sweep — exact token-ID parity on every stride
boundary, embedding/decode/roundtrip numerics — printing pass/fail per stage
and exiting non-zero on any failure.

The torch reference is, in preference order:

1. the pip ``encodec`` package (the reference's actual dependency), when
   importable — the strongest possible gate;
2. the repo's torch mirror module classes (``tests/torch_encodec_mirror.py``
   — real state-dict naming, weight-norm reparametrization, exact padding),
   which load the same checkpoint file.

``--ar``/``--nar`` additionally convert reference-trained Valle checkpoints
(models/convert.py) and smoke-test a greedy decode; with ``norm='LayerNorm'``
configs the AR logits are also checked against the torch equation mirror.

CI auto-skip: tests invoke :func:`verify_codec` only when the artifact path
exists (no artifact in the image → skipped, not failed).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

# The TestFullStackTorchParity sweep: every stride boundary (319/320/321 around
# one hop, 1600 stride-5, 7777 coprime, 16000 = the reference's 50-frame shape
# anchor) plus multi-seed audio at 2400.
ENCODE_SWEEP = [(0, 319), (0, 320), (0, 321), (0, 1600), (0, 7777), (0, 16000),
                (1, 2400), (2, 2400), (3, 2400), (4, 2400)]


def _wav(seed: int, samples: int) -> np.ndarray:
    wav = np.random.RandomState(100 + seed).randn(samples).astype(np.float32)
    return wav / np.abs(wav).max()


def _load_state_dict(path: str):
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=True)
    sd = obj.get('best_state', obj) if isinstance(obj, dict) else obj
    if hasattr(sd, 'state_dict'):
        sd = sd.state_dict()
    return sd


class _PipReference:
    """The pip ``encodec`` package at 24 kHz / 6 kbps, loading ``sd``."""

    def __init__(self, sd):
        from encodec import EncodecModel
        import torch
        self._torch = torch
        model = EncodecModel.encodec_model_24khz(pretrained=False)
        model.set_target_bandwidth(6.0)
        model.load_state_dict(sd)
        self.model = model.eval()

    def encode(self, wav: np.ndarray) -> np.ndarray:
        with self._torch.no_grad():
            frames = self.model.encode(self._torch.from_numpy(wav)[None, None])
        return self._torch.cat([f[0] for f in frames], dim=-1)[0].numpy()

    def decode(self, codes: np.ndarray) -> np.ndarray:
        with self._torch.no_grad():
            wav = self.model.decode(
                [(self._torch.from_numpy(codes)[None], None)])
        return wav[0, 0].numpy()

    def get_embedding(self, wav: np.ndarray) -> np.ndarray:
        with self._torch.no_grad():
            return self.model.encoder(
                self._torch.from_numpy(wav)[None, None])[0].numpy()


class _MirrorReference:
    """tests/torch_encodec_mirror.EncodecMirror loading the same checkpoint."""

    def __init__(self, sd):
        import torch
        self._torch = torch
        tests_dir = Path(__file__).resolve().parents[2] / 'tests'
        if str(tests_dir) not in sys.path:
            sys.path.insert(0, str(tests_dir))
        from torch_encodec_mirror import EncodecMirror
        mirror = EncodecMirror(seed=0)
        mirror.load_state_dict({k: torch.as_tensor(np.asarray(v))
                                for k, v in sd.items()})
        self.model = mirror.eval()

    def encode(self, wav):
        return self.model.encode(self._torch.from_numpy(wav)[None])[0].numpy()

    def decode(self, codes):
        return self.model.decode(self._torch.from_numpy(codes)[None])[0].numpy()

    def get_embedding(self, wav):
        return self.model.get_embedding(
            self._torch.from_numpy(wav)[None])[0].numpy()


def _references(sd) -> list[tuple[str, object]]:
    refs: list[tuple[str, object]] = []
    try:
        refs.append(('pip-encodec', _PipReference(sd)))
    except ImportError:
        pass
    refs.append(('torch-mirror', _MirrorReference(sd)))
    return refs


def verify_codec(checkpoint: str, verbose: bool = True) -> dict[str, bool]:
    """Run the BASELINE #1 gate for one converted checkpoint.  Returns
    {stage-name: passed}; all True == drop-in ready."""
    from ..codec import EncodecTPU
    codec = EncodecTPU(checkpoint=checkpoint)
    sd = _load_state_dict(checkpoint)
    results: dict[str, bool] = {}

    def report(stage: str, ok: bool, detail: str = ''):
        results[stage] = ok
        if verbose:
            print(f'[{"PASS" if ok else "FAIL"}] {stage}'
                  + (f'  ({detail})' if detail else ''))

    for ref_name, ref in _references(sd):
        ok = True
        worst = ''
        for seed, samples in ENCODE_SWEEP:
            wav = _wav(seed, samples)
            want = ref.encode(wav)
            got = np.asarray(codec.encode(wav))
            if got.shape != want.shape or not np.array_equal(got, want):
                ok = False
                n_bad = (int((got != want).sum())
                         if got.shape == want.shape else -1)
                worst = f'len={samples}: {n_bad} mismatched token ids'
                break
        report(f'encode-token-parity[{ref_name}]', ok, worst)

        wav = _wav(0, 4800)
        want = ref.get_embedding(wav)
        got = np.asarray(codec.get_embedding(wav))
        scale = max(1.0, float(np.abs(want).max()))
        err = float(np.abs(got - want).max()) if got.shape == want.shape else np.inf
        report(f'embedding-parity[{ref_name}]', err <= 1e-4 * scale + 1e-4,
               f'max abs err {err:.2e}')

        codes = np.random.RandomState(200).randint(0, 1024, (8, 15)).astype(np.int32)
        want = ref.decode(codes)
        got = np.asarray(codec.decode(codes))
        scale = max(1.0, float(np.abs(want).max()))
        err = float(np.abs(got - want).max()) if got.shape == want.shape else np.inf
        report(f'decode-waveform-parity[{ref_name}]', err <= 1e-4 * scale + 1e-4,
               f'max abs err {err:.2e}')

        wav = _wav(0, 3200)
        want = ref.decode(ref.encode(wav))
        got = np.asarray(codec.encode_decode(wav))
        scale = max(1.0, float(np.abs(want).max()))
        err = float(np.abs(got - want).max()) if got.shape == want.shape else np.inf
        report(f'roundtrip-parity[{ref_name}]', err <= 1e-4 * scale + 1e-4,
               f'max abs err {err:.2e}')
    return results


def verify_valle(checkpoint: str, model_name: str, config) -> dict[str, bool]:
    """Convert a reference-trained Valle checkpoint and gate it: finite greedy
    decode, plus (AR + LayerNorm configs) logit parity vs the torch equation
    mirror over the converted params."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..models import ValleAR, ValleNAR
    from ..models.convert import load_torch_checkpoint

    results: dict[str, bool] = {}
    params = load_torch_checkpoint(checkpoint, model_name,
                                   num_layers=config.num_layers,
                                   num_quantizers=config.num_quantizers)
    # The parity configuration: greedy, f32 everywhere INCLUDING the decode KV
    # cache — the serving default kv_cache_dtype='bfloat16' adds ~1e-3 logit
    # noise, which is harmless for audio but flips near-tie argmaxes and
    # breaks token-exactness against the step-by-step torch loop.
    cfg = dataclasses.replace(config, temperature=0.0, num_beams=1,
                              max_audio_len=min(config.max_audio_len, 16),
                              matmul_precision='highest', dtype='float32',
                              kv_cache_dtype='float32', dropout=0.0)
    rs = np.random.RandomState(0)
    pt = rs.randint(0, cfg.vocab_size - 8, (5,))
    pc = rs.randint(0, cfg.num_audio_tokens, (6, cfg.num_quantizers))
    if model_name == 'ValleNAR':
        model = ValleNAR(cfg, params=jax.tree.map(jnp.asarray, params))
        first = rs.randint(0, cfg.num_audio_tokens, (8,))
        out = np.asarray(model.generate(jnp.asarray(pt), jnp.asarray(pc),
                                        jnp.asarray(pt[:2]), jnp.asarray(first)))
        results['nar-decode-finite'] = bool(
            (out >= 0).all() and (out < cfg.num_audio_tokens).all())
    else:
        model = ValleAR(cfg, params=jax.tree.map(jnp.asarray, params))
        out = np.asarray(model.generate(jnp.asarray(pt), jnp.asarray(pc),
                                        jnp.asarray(pt[:2])))
        results['ar-decode-finite'] = bool((out >= 0).all())
        if cfg.norm == 'LayerNorm':
            tests_dir = Path(__file__).resolve().parents[2] / 'tests'
            if str(tests_dir) not in sys.path:
                sys.path.insert(0, str(tests_dir))
            try:
                from torch_mirror import TorchValleAR
                tokens_full = np.concatenate([pt, pt[:2]])
                want = TorchValleAR(model.params, cfg).greedy_generate(
                    tokens_full, pc[:, 0], cfg.max_audio_len)
                results['ar-greedy-parity[torch-mirror]'] = (
                    [int(c) for c in out] == want)
            except ImportError:
                pass   # mirror not present in an installed wheel: skip
    return results


_G2P_SENTENCES = (
    'the quick brown fox jumps over the lazy dog.',
    'hello world, this is a test of the speech frontend.',
    'she said they would go home tomorrow morning.',
    'i have 3 cats and $2.50 in my pocket.',
    'the president spoke about education and health.',
)


def verify_frontend(sentences=_G2P_SENTENCES, verbose: bool = True) -> dict:
    """Compare the bundled no-dependency frontend against the REAL ``g2p_en``
    (the reference's actual dependency, data.py:18-25) when it is importable —
    the network-day gate for the text side.  Returns
    {'available': bool, 'vocab_identical': bool, 'phoneme_agreement': float}.

    The fallback's tier-2 letter-to-sound rules are approximate by design, so
    the gate reports token-level agreement rather than demanding exactness;
    vocab layout (symbol → id) must match exactly or trained checkpoints are
    not interchangeable."""
    from ..data.frontend import PHONEMES, PUNCTUATION, PhonemeTokenizer
    try:
        from g2p_en import G2p
    except Exception:
        if verbose:
            print('[SKIP] g2p_en not importable — frontend gate needs network day')
        return {'available': False}
    g2p = G2p()
    vocab_ok = list(g2p.phonemes) == PHONEMES[:len(list(g2p.phonemes))] \
        and PUNCTUATION == [' ', ',', '.']
    ours = PhonemeTokenizer(use_g2p=False)
    agree = total = 0
    for s in sentences:
        a = list(g2p(s))
        b = ours.phonemize(s)
        total += max(len(a), len(b))
        agree += sum(x == y for x, y in zip(a, b))
    out = {'available': True, 'vocab_identical': bool(vocab_ok),
           'phoneme_agreement': agree / max(total, 1)}
    if verbose:
        print(f'[{"PASS" if vocab_ok else "FAIL"}] frontend vocab layout '
              f'identical to g2p_en')
        print(f'[INFO] fallback-vs-g2p_en phoneme agreement: '
              f'{out["phoneme_agreement"]:.1%}')
    return out


def main(argv=None) -> int:
    import argparse

    from ..config import ConfigValle
    parser = argparse.ArgumentParser(
        description='Verify converted pretrained artifacts against their torch '
                    'reference (BASELINE #1 gate)')
    parser.add_argument('--codec', type=Path, default=None,
                        help='EnCodec torch checkpoint (.th)')
    parser.add_argument('--ar', type=Path, default=None,
                        help='Reference-trained ValleAR checkpoint')
    parser.add_argument('--nar', type=Path, default=None,
                        help='Reference-trained ValleNAR checkpoint')
    parser.add_argument('-c', '--config', type=Path, default=None)
    parser.add_argument('--frontend', action='store_true',
                        help='Also cross-check the phoneme frontend against a '
                             'real g2p_en install (auto-skips when absent)')
    args = parser.parse_args(argv)
    if not (args.codec or args.ar or args.nar or args.frontend):
        parser.error('nothing to verify: pass --codec, --ar/--nar, or --frontend')
    config = ConfigValle.from_json(args.config) if args.config else ConfigValle()

    results: dict[str, bool] = {}
    if args.codec:
        results.update(verify_codec(str(args.codec)))
    if args.ar:
        results.update(verify_valle(str(args.ar), 'ValleAR', config))
    if args.nar:
        results.update(verify_valle(str(args.nar), 'ValleNAR', config))
    if args.frontend:
        fr = verify_frontend()
        if fr.get('available'):
            results['frontend-vocab-layout[g2p_en]'] = fr['vocab_identical']
    for stage, ok in results.items():
        print(f'{stage}: {"PASS" if ok else "FAIL"}')
    n_fail = sum(not ok for ok in results.values())
    print(f'{len(results) - n_fail}/{len(results)} stages passed')
    return 1 if n_fail else 0


if __name__ == '__main__':
    sys.exit(main())
