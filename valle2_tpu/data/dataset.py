"""Datasets + loaders: HF LJSpeech pipeline and a synthetic fallback.

TPU re-design of the reference data path (``/root/reference/valle/data.py``): same
shape contract per item ({'codes': (nq, T), 'tokens': (Tt,)}) and the same 90/10 HF
split, but EnCodec tokenization runs **batched on device** through the native codec
(the reference encodes per-item on CPU inside DataLoader workers — its real input
bottleneck, SURVEY §3.1) and results are memoized so each utterance is encoded once
per run.

``SyntheticValleDataset`` generates deterministic phoneme/code pairs for tests,
benchmarks and zero-egress environments (LJSpeech needs a download the image lacks).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from ..codec import EncodecTPU
from ..config import ConfigValle
from ..utils import log_info, normalize_audio
from .collate import get_collate
from .frontend import PhonemeTokenizer


class ValleDataset:
    """HF-dataset-backed items (reference ValleDataset, data.py:13-43)."""

    def __init__(self, dataset, config: ConfigValle, codec: EncodecTPU | None = None):
        self.dataset = dataset
        self.config = config
        self.codec = codec if codec is not None else EncodecTPU()
        self.tokenizer = PhonemeTokenizer()
        self.sym2idx = self.tokenizer.sym2idx
        self._cache: dict[int, dict[str, np.ndarray]] = {}

    def _tokenize(self, text: str) -> np.ndarray:
        return self.tokenizer(text)

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        if idx in self._cache:
            return self._cache[idx]
        item = self.dataset[idx]
        audio = np.asarray(item['audio']['array'], dtype=np.float32)
        sr = item['audio']['sampling_rate']
        tokens = self._tokenize(item['text'])
        wav = normalize_audio(audio, sr, self.codec.sampling_rate)
        codes = np.asarray(self.codec.encode(wav))          # (nq, T), on device
        out = {'codes': codes, 'tokens': tokens}
        self._cache[idx] = out
        return out

    def _load_wav(self, idx: int):
        item = self.dataset[idx]
        audio = np.asarray(item['audio']['array'], dtype=np.float32)
        wav = np.asarray(normalize_audio(audio, item['audio']['sampling_rate'],
                                         self.codec.sampling_rate))
        return wav, item['text']

    def _cache_key(self) -> str:
        """Fingerprint of (dataset identity, codec weights, frontend version)
        — any of the three changing must invalidate the persistent cache."""
        import hashlib

        from .frontend import FRONTEND_VERSION
        h = hashlib.sha256()
        h.update(f'frontend-v{FRONTEND_VERSION};'.encode())
        h.update(self.codec.fingerprint().encode())
        n = len(self.dataset)
        h.update(str(n).encode())
        hf_fp = getattr(self.dataset, '_fingerprint', None)
        if hf_fp:                          # HF datasets carry a content hash
            h.update(str(hf_fp).encode())
        else:
            # Plain sequences: probe up to 16 evenly-spaced items, hashing
            # transcript + audio CONTENT samples (ends + global sum), so
            # regenerated/renormalized audio with unchanged lengths still
            # invalidates the key.  Boundary: an edit confined to un-probed
            # items with identical global stats can slip through — HF datasets
            # (the production path) are covered by their content fingerprint.
            probes = sorted(set(np.linspace(0, n - 1, min(n, 16), dtype=int))
                            if n else [])
            for idx in probes:
                item = self.dataset[idx]
                audio = np.asarray(item['audio']['array'], np.float32)
                h.update(item['text'].encode())
                h.update(str(len(audio)).encode())
                h.update(str(item['audio']['sampling_rate']).encode())
                h.update(np.ascontiguousarray(audio[:64]).tobytes())
                h.update(np.ascontiguousarray(audio[-64:]).tobytes())
                h.update(np.float64(audio.sum()).tobytes())
        return h.hexdigest()[:24]

    def _cache_file(self, cache_dir) -> 'Path':
        from pathlib import Path
        return Path(cache_dir) / f'codes-{self._cache_key()}.npz'

    def _load_disk_cache(self, cache_dir) -> bool:
        """Populate ``_cache`` from disk; True iff EVERY item was covered (a
        partial or stale file is ignored — recompute, then overwrite)."""
        path = self._cache_file(cache_dir)
        if not path.exists():
            return False
        try:
            with np.load(path) as z:
                n = int(z['n_items'])
                if n != len(self.dataset):
                    return False
                loaded = {
                    idx: {'codes': z[f'codes_{idx}'].astype(np.int32),
                          'tokens': z[f'tokens_{idx}'].astype(np.int32)}
                    for idx in range(n)}
        except Exception:   # noqa: BLE001 — corrupt/truncated file: recompute
            log_info('Ignoring unreadable codes cache %s', path)
            return False
        self._cache.update(loaded)
        log_info('Loaded %d precomputed codec items from %s', len(loaded), path)
        return True

    def _save_disk_cache(self, cache_dir) -> None:
        from pathlib import Path
        path = self._cache_file(cache_dir)
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        arrays: dict[str, np.ndarray] = {
            'n_items': np.asarray(len(self.dataset))}
        for idx, item in self._cache.items():
            # Codes fit int16 (codebook 1024); tokens fit int16 too — halves
            # the file vs int32 (LJSpeech-scale: ~125 MB instead of ~250 MB).
            arrays[f'codes_{idx}'] = item['codes'].astype(np.int16)
            arrays[f'tokens_{idx}'] = item['tokens'].astype(np.int16)
        tmp = path.with_suffix('.tmp.npz')
        np.savez(tmp, **arrays)            # atomic publish: tmp + rename
        tmp.replace(path)
        log_info('Saved codec-token cache (%d items) → %s', len(self._cache), path)

    def precompute_codes(self, batch_size: int = 16,
                         length_buckets: tuple[int, ...] = (2, 4, 8, 12, 16, 24),
                         cache_dir=None) -> None:
        """Tokenize the whole dataset through the codec in length-bucketed batches.

        The reference encodes one utterance at a time on CPU inside DataLoader
        workers — its real input bottleneck (SURVEY §3.1).  Here audio is padded to
        second-granularity buckets and pushed through ``batch_encode`` on the TPU,
        codes are truncated back to each item's true frame count and memoized.
        Audio longer than the largest bucket gets its own hop-aligned group
        (never silently truncated against its transcript).

        Approximation note: the codec's strided convs reflect-pad PER STAGE at
        the sequence end, so the bucket's zero padding can perturb codes in the
        final ~2 frames of a non-hop-aligned item relative to a solo
        ``encode`` (all earlier frames are exact — the stack is causal-left).
        One run therefore uses ONE path consistently: ``get_dataloaders``
        precomputes everything up front and ``__getitem__`` serves the cache.

        Memory: waveforms are loaded per encode-chunk (two passes over the
        dataset metadata), never all at once.

        ``cache_dir``: persistent disk cache, keyed by (dataset fingerprint,
        codec weight hash, frontend version).  A fresh process whose key
        matches loads every item from one npz and encodes NOTHING (the
        reference re-encodes the whole dataset every run, data.py:30-43);
        any mismatch recomputes and overwrites.
        """
        if cache_dir is not None and self._load_disk_cache(cache_dir):
            return
        from ..codec.encodec import HOP as hop
        sr = self.codec.sampling_rate
        groups: dict[int, list[int]] = {}
        for idx in range(len(self.dataset)):
            if idx in self._cache:
                continue
            wav, _ = self._load_wav(idx)       # pass 1: lengths only (wav freed)
            secs = len(wav) / sr
            bucket = next((b for b in length_buckets if secs <= b), None)
            # Group key = INTEGER sample width (a float-seconds round trip
            # could truncate one sample off the hop-aligned width and silently
            # drop the final sample of the longest items).
            if bucket is None:
                # Oversize: own hop-aligned width — keep codes/transcript aligned.
                width = -(-len(wav) // hop) * hop
            else:
                width = int(bucket * sr)
            groups.setdefault(width, []).append(idx)

        for width, idxs in groups.items():
            for start in range(0, len(idxs), batch_size):
                chunk = idxs[start:start + batch_size]
                padded = np.zeros((len(chunk), width), np.float32)
                lens, toks = [], []
                for i, idx in enumerate(chunk):   # pass 2: load within the chunk
                    wav, text = self._load_wav(idx)
                    padded[i, :min(len(wav), width)] = wav[:width]
                    lens.append(min(len(wav), width))
                    toks.append(self._tokenize(text))
                batch_codes = np.asarray(self.codec.batch_encode(padded))
                for i, idx in enumerate(chunk):
                    n_frames = -(-lens[i] // hop)
                    # copy(): a view would pin the whole padded batch in memory.
                    self._cache[idx] = {
                        'codes': batch_codes[i, :, :n_frames].copy(),
                        'tokens': toks[i]}
        log_info('Precomputed codec tokens for %d items', len(self._cache))
        if cache_dir is not None:
            self._save_disk_cache(cache_dir)


class SyntheticValleDataset:
    """Deterministic synthetic items with LJSpeech-like length statistics."""

    def __init__(self, config: ConfigValle, size: int = 256, seed: int = 0,
                 min_frames: int = 60, max_frames: int = 400):
        self.config = config
        self.size = size
        self.seed = seed
        self.min_frames = min_frames
        self.max_frames = max_frames

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        rs = np.random.RandomState(self.seed * 100003 + idx)
        t_codes = rs.randint(self.min_frames, self.max_frames)
        t_tokens = max(4, t_codes // 6)                    # codes_len > tokens_len
        return {
            'codes': rs.randint(0, self.config.num_audio_tokens,
                                (self.config.num_quantizers, t_codes)).astype(np.int32),
            'tokens': rs.randint(0, self.config.vocab_size,
                                 (t_tokens,)).astype(np.int32),
        }


class DataLoader:
    """Minimal shuffling batcher (the torch DataLoader equivalent for this stack).

    Single-process: the heavy work (codec encode) already runs on the TPU, so worker
    processes would only move Python overhead around.
    """

    def __init__(self, dataset, batch_size: int, collate_fn, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        """Pin the NEXT iteration's shuffle epoch (torch DistributedSampler's
        set_epoch analog).  Shuffle order is a pure function of
        ``seed + epoch``, so a resumed run that sets the epoch it was
        preempted in replays the exact batch stream of the original run
        (Trainer.fit fast-forwards within the epoch)."""
        self._epoch = int(epoch)

    def _batches(self) -> Iterator[dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        if hasattr(self.dataset, 'set_epoch'):
            # Epoch-aware datasets (e.g. GrammarDataset's dynamic
            # realizations) draw fresh-but-DETERMINISTIC samples per epoch —
            # the stream stays a pure function of (seed, epoch, index), so
            # the resume fast-forward replays it exactly.
            self.dataset.set_epoch(self._epoch)
        self._epoch += 1
        for start in range(0, len(order) - (self.batch_size - 1 if self.drop_last else 0),
                           self.batch_size):
            idxs = order[start:start + self.batch_size]
            yield self.collate_fn([self.dataset[int(i)] for i in idxs])

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        """Iterate with one batch of background prefetch: host-side collate overlaps
        the device step (the reference used torch DataLoader workers for this;
        one thread suffices since the heavy encode already runs on the TPU)."""
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=2)
        sentinel = object()
        stop = threading.Event()

        def put_stoppable(item) -> bool:
            # Every put gives up when the consumer abandons the pass (e.g.
            # fit() breaking at max_steps) — a bare q.put would leave this
            # thread blocked forever holding collated batches.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for batch in self._batches():
                    if not put_stoppable((batch, None)):
                        return
            except BaseException as exc:   # noqa: BLE001 — re-raise in consumer
                put_stoppable((None, exc))
                return
            put_stoppable((sentinel, None))

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item, exc = q.get()
                if exc is not None:
                    # A dataset/collate error mid-epoch must FAIL the epoch,
                    # not silently truncate it.
                    raise exc
                if item is sentinel:
                    return
                yield item
        finally:
            stop.set()


def get_dataloaders(model_name: str, config: ConfigValle,
                    synthetic: bool = False) -> tuple[DataLoader, DataLoader]:
    """Train/valid loaders (reference get_dataloaders, data.py:46-63: 90/10 split)."""
    collate = get_collate(model_name)(config)
    if synthetic:
        train_ds = SyntheticValleDataset(config, size=max(8 * config.batch_size, 64))
        valid_ds = SyntheticValleDataset(config, size=max(2 * config.valid_batch_size, 8),
                                         seed=1)
    elif (str(config.dataset) == 'grammar'
          or str(config.dataset).startswith('grammar://')):
        # Deterministic compositional grammar (data/grammar.py) as a first-
        # class dataset: the exact production path (collate buckets, prefetch,
        # checkpoints) trains the generalization testbed with one CLI command.
        from .grammar import build_grammar_datasets
        train_ds, valid_ds, _ = build_grammar_datasets(config)
    else:
        from datasets import load_dataset
        from ..utils import log_warning
        log_info('Loading HF dataset %s', config.dataset)
        if not config.codec_ckpt:
            log_warning('No codec_ckpt configured: tokenizing audio with a '
                        'RANDOM-init codec — fine for pipeline tests, wrong '
                        'for real training/serving (set codec_ckpt to the '
                        'converted EnCodec checkpoint)')
        codec = EncodecTPU(checkpoint=config.codec_ckpt or None)
        train_ds = ValleDataset(load_dataset(config.dataset, split='train[:90%]',
                                             trust_remote_code=True), config, codec)
        valid_ds = ValleDataset(load_dataset(config.dataset, split='train[90%:]',
                                             trust_remote_code=True), config, codec)
        # Batched, bucketed on-device tokenization up front: the per-item
        # path would compile the encoder once per distinct audio length
        # (minutes each) and run unbatched — the reference's own bottleneck.
        # With codes_cache_dir set, a repeat run loads the tokens from disk
        # and encodes nothing.
        cache_dir = config.codes_cache_dir or None
        train_ds.precompute_codes(cache_dir=cache_dir)
        valid_ds.precompute_codes(cache_dir=cache_dir)
    train = DataLoader(train_ds, config.batch_size, collate, shuffle=True,
                       seed=config.seed)
    # Validation keeps the trailing partial batch (torch DataLoader default).
    valid = DataLoader(valid_ds, config.valid_batch_size, collate, shuffle=False,
                       drop_last=False)
    return train, valid
