"""End-to-end VALL-E X pipelines: TTS (text → waveform) and ASR (audio → text).

The reference has no end-to-end entry point (SURVEY §1: 'inference: user code calls
model.generate directly'); this module composes the full stack the way the BASELINE
configs describe:

TTS  (BASELINE config #4): phonemize → AR first-codebook decode (on-device while_loop)
     → NAR 7-stage refinement (on-device scan) → native codec decode → 24 kHz waveform,
     with a cloning prompt (prompt audio + its transcript).
ASR  (BASELINE config #5): audio → codec encode → direction-swapped AR decode over the
     phoneme vocabulary, batched.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import codec as codec_mod
from .codec import EncodecTPU
from .config import ConfigValle, bucket_len
from .data.frontend import PhonemeTokenizer
from .models import ValleAR, ValleNAR
from .models import ar as ar_mod
from .models import nar as nar_mod
from .utils import normalize_audio


def _fused_tts_fn(ar_params, nar_params, codec_dec_params, tokens, tokens_lens,
                  prompt_codes, p_lens, rng, config: ConfigValle,
                  tp: tuple | None = None):
    """The whole TTS pipeline as one XLA program: AR while_loop decode → NAR 7-stage
    refinement → codec waveform synthesis.  ONE dispatch, ONE host fetch — and
    batched: B utterances (padded, true lengths given) synthesize together.

    Rationale: on the target runtime a host↔device round trip costs ~80 ms — more
    than the entire device-side compute of the pipeline.  The staged path
    (ValleTTS.synthesize) pays 3+ fetches; this pays 1 (north-star: no host round
    trips inside the pipeline), and batching amortizes it across utterances.

    tokens: (B, Ttm), true lens tokens_lens (B,); prompt_codes: (B, Pm, nq), true
    lens p_lens (B,).  Returns (waveforms (B, max_new*320), gen_lens (B,),
    codes (B, max_new, nq)); slice wav[i, :gen_lens[i]*320] on host.
    ``tp``: manual-TP context (models/ar._decode_prefill) — AR and NAR run the
    Megatron split per model rank; the tiny codec decode replicates (every
    rank synthesizes the identical waveform in lockstep).
    """
    eos = config.eos_token
    bos = config.bos_token
    max_new = config.max_audio_len
    b, pm = prompt_codes.shape[0], prompt_codes.shape[1]
    rng_ar, rng_nar = jax.random.split(rng)

    # AR first-codebook decode (BOS-prefixed prompts; valid length p_len + 1).
    codes0 = jnp.concatenate(
        [jnp.full((b, 1), bos, jnp.int32), prompt_codes[:, :, 0]], axis=1)
    codes_buf, _, best = ar_mod._decode_fn(
        ar_params, tokens, tokens_lens, codes0, p_lens + 1, rng_ar, config,
        tp=tp)
    rows = jnp.take_along_axis(codes_buf, best[:, None, None].astype(jnp.int32),
                               axis=1)[:, 0]            # (B, Pm+1+max_new)
    gen_region = rows[:, pm + 1:]                       # (B, max_new)
    is_eos = gen_region == eos
    gen_lens = jnp.where(jnp.any(is_eos, axis=1), jnp.argmax(is_eos, axis=1), max_new)
    first_layer = jnp.where(is_eos, 0, gen_region)      # keep ids in-vocab past EOS

    # NAR refinement over the padded buffers (per-length masks keep valid rows exact).
    codes = nar_mod._generate_fn(nar_params, tokens, tokens_lens, prompt_codes,
                                 p_lens, first_layer, gen_lens, rng_nar, config,
                                 tp=tp)

    # Waveform synthesis; codec is causal, so frames past gen_len cannot affect
    # earlier samples — slice on host.
    wavs = codec_mod.decode(codec_dec_params, codes.transpose(0, 2, 1))
    return wavs.astype(jnp.float32), gen_lens, codes


@dataclass
class TTSResult:
    waveform: np.ndarray            # (T,) float32 @ 24 kHz
    codes: np.ndarray               # (frames, num_quantizers)
    rtf: float                      # wall-clock / audio-seconds
    timings: dict[str, float]


class ValleTTS:
    """text (+ cloning prompt) → waveform."""

    def __init__(self, config: ConfigValle, ar: ValleAR | None = None,
                 nar: ValleNAR | None = None, codec: EncodecTPU | None = None,
                 tokenizer: PhonemeTokenizer | None = None, mesh=None):
        """``mesh``: optional jax.sharding.Mesh — batch_synthesize shards utterance
        rows over the 'data' axis (params replicated), scaling fused serving
        throughput across chips over ICI."""
        self.config = config
        self.mesh = mesh
        self.ar = ar if ar is not None else ValleAR(config, mesh=mesh)
        self.nar = nar if nar is not None else ValleNAR(config)
        # Waveform synthesis follows the model compute dtype; codec *encode* stays f32.
        self.codec = codec if codec is not None else EncodecTPU(decode_dtype=config.dtype)
        self.tokenizer = tokenizer if tokenizer is not None else PhonemeTokenizer()
        import threading
        self._stream_init_lock = threading.Lock()
        prec = config.matmul_precision

        pipe_config = config
        data_sharded = False
        self._pipe_tp = None          # (mesh axis names, mp) — manual TP
        if mesh is not None:
            mp = mesh.shape.get('model', 1)
            if mp == 1:
                # Data-only mesh: shard_map the whole pipeline over utterance
                # rows — keeps the fused Pallas decode kernel on a mesh
                # (mirrors ValleAR; a pallas_call cannot partition under GSPMD
                # but per-shard it sees only local shapes).
                data_sharded = True
            else:
                from .parallel import tp_divisible
                int4_ok = config.weight_dtype != 'int4' or (
                    (config.d_model // mp) % 2 == 0
                    and (config.dim_feedforward // mp) % 2 == 0)
                if tp_divisible(config.n_heads, config.dim_feedforward, mp) \
                        and config.weight_dtype != 'int8' and int4_ok:
                    # Manual TP: AR decode AND NAR refinement run the Megatron
                    # split per model rank inside ONE shard_map — the fused
                    # Pallas kernel stays live on TP meshes (mirrors ValleAR).
                    # int4 rides it too (ranked per-rank packing, fp psums);
                    # int8 weights keep the per-model GSPMD path: the fused
                    # gate would decline anyway and ValleAR's own manual-TP
                    # int8 path covers batch decode.
                    self._pipe_tp = (tuple(mesh.axis_names), mp)
                else:
                    # GSPMD fallback (odd splits / int8): the fused kernel AND
                    # flash prefill must both go — GSPMD cannot partition a
                    # Mosaic kernel (ops.attention.flash_shard_mesh).
                    import dataclasses
                    pipe_config = dataclasses.replace(
                        config, use_fused_decode=False,
                        use_flash_attention=False)

        if data_sharded:
            from .parallel import data_shard_map

            def _pipe_body(ar_p, nar_p, cod_p, tokens, tl, codes, pl, rng):
                rng = jax.random.fold_in(rng, jax.lax.axis_index('data'))
                with jax.default_matmul_precision(prec):
                    return _fused_tts_fn(ar_p, nar_p, cod_p, tokens, tl, codes,
                                         pl, rng, pipe_config)

            _fused = data_shard_map(mesh, _pipe_body, n_args=8,
                                    sharded=(3, 4, 5, 6), n_out=3)
        elif self._pipe_tp is not None:
            from jax.sharding import PartitionSpec as P
            from .parallel import tp_decode_specs
            tp_ctx = self._pipe_tp
            has_data = 'data' in mesh.axis_names and \
                mesh.shape.get('data', 1) > 1
            data_spec = P('data') if 'data' in mesh.axis_names else P()

            def _pipe_body(ar_p, nar_p, cod_p, tokens, tl, codes, pl, rng):
                if has_data:
                    rng = jax.random.fold_in(rng, jax.lax.axis_index('data'))
                with jax.default_matmul_precision(prec):
                    return _fused_tts_fn(ar_p, nar_p, cod_p, tokens, tl, codes,
                                         pl, rng, pipe_config, tp=tp_ctx)

            # Spec trees are rebind-stable (structure survives load()); the
            # codec decoder replicates (a single P() broadcasts subtree-wide).
            _fused = jax.shard_map(
                _pipe_body, mesh=mesh,
                in_specs=(tp_decode_specs(self.ar.decode_params),
                          tp_decode_specs(self.nar.params), P(),
                          data_spec, data_spec, data_spec, data_spec, P()),
                out_specs=(data_spec, data_spec, data_spec),
                check_vma=False)
        else:
            def _fused(ar_p, nar_p, cod_p, tokens, tl, codes, pl, rng):
                with jax.default_matmul_precision(prec):
                    return _fused_tts_fn(ar_p, nar_p, cod_p, tokens, tl, codes,
                                         pl, rng, pipe_config)

        from .aot import cached_jit, config_key
        self._cfg_key = config_key(config) + ('|mesh' if mesh is not None else '') \
            + (f'|tp{self._pipe_tp[1]}' if self._pipe_tp else '')
        self._fused_jit = cached_jit(_fused, tag='tts_fused',
                                     extra_key=self._cfg_key)

    def _mesh_params(self, ar_p, nar_p, cod_p):
        """Mesh-sharded views of the three param trees, cached by source
        identity — re-sharding per request would re-transfer the whole model
        (hundreds of MB at 204M) on the serving hot path.  The cache is a
        small identity-keyed dict (holding the sources, so ids stay live):
        multi-voice serving alternates a handful of param trees per process
        and each must re-place only once."""
        cache = getattr(self, '_mesh_cache', None)
        if cache is None:
            cache = self._mesh_cache = {}
        key = (id(ar_p), id(nar_p), id(cod_p))
        hit = cache.get(key)
        if hit is not None:
            return hit[1]
        from .parallel import replicated, shard_params
        rep = replicated(self.mesh)
        if self._pipe_tp is not None:
            # Manual TP: fused-qkv columns regrouped rank-major, leaves
            # pre-placed by the shard_map specs (mirrors ValleAR._tp_params).
            from jax.sharding import NamedSharding
            from .parallel import tp_decode_specs, tp_permute_qkv
            mp = self._pipe_tp[1]

            def tp_place(tree):
                view = dict(tree)
                view['transformer'] = tp_permute_qkv(tree['transformer'], mp)
                return jax.tree.map(
                    lambda a, s: jax.device_put(
                        a, NamedSharding(self.mesh, s)),
                    view, tp_decode_specs(view))

            # int4 AR weights need the RANKED per-rank packing, which
            # ValleAR._tp_params builds (and caches) from the dense
            # params; dense/other trees permute+place here.  NAR stays
            # unquantized (parallel refinement is compute-, not
            # weight-streaming-bound).
            ar_tp = self.ar._tp_params() \
                if self.config.weight_dtype == 'int4' else tp_place(ar_p)
            sharded = (ar_tp, tp_place(nar_p), jax.device_put(cod_p, rep))
        else:
            # Transformer params follow the Megatron TP rules (replicated
            # on a DP-only mesh); the tiny codec decoder replicates.
            sharded = (shard_params(self.mesh, ar_p),
                       shard_params(self.mesh, nar_p),
                       jax.device_put(cod_p, rep))
        cache[key] = ((ar_p, nar_p, cod_p), sharded)
        return sharded

    def prepare_prompt(self, prompt_audio, prompt_sr: int, prompt_text: str
                       ) -> tuple[np.ndarray, np.ndarray]:
        """Cloning prompt → (prompt_tokens, prompt_codes (T, nq))."""
        wav = normalize_audio(jnp.asarray(prompt_audio), prompt_sr,
                              self.codec.sampling_rate)
        codes = np.asarray(self.codec.encode(wav)).T        # (T, nq)
        tokens = self.tokenizer(prompt_text)
        return tokens, codes

    def batch_synthesize(self, texts: list, prompt_tokens_list: list,
                         prompt_codes_list: list, rng: jax.Array | None = None,
                         bucket: bool = True,
                         override_params: tuple | None = None) -> list[TTSResult]:
        """Batched fused pipeline: B utterances synthesize in one XLA dispatch with
        one host fetch (the serving-throughput path; per-item outputs equal the
        single-utterance greedy results thanks to per-length masking throughout).

        ``override_params``: optional ``(ar_params, nar_params)`` to run this
        batch with different weights (multi-voice serving — LoRA fine-tunes
        merged per voice); ``None`` entries keep the default model's.  Params
        are jit ARGUMENTS, so a voice switch costs no recompile as long as the
        tree structure matches (use a per-voice ``ValleAR(...).decode_params``
        view under ``weight_dtype='int8'/'int4'``)."""
        if not texts:
            return []
        if override_params is not None and self._pipe_tp is not None \
                and self.config.weight_dtype == 'int4':
            # _mesh_params would silently substitute the DEFAULT model's
            # ranked int4 packing for the override (ValleAR._tp_params).
            raise NotImplementedError(
                'override_params with int4 weights under manual TP is not '
                'supported — register the voice on its own ValleTTS/mesh')
        if rng is None:
            rng = jax.random.key(self.config.seed)
        t0 = time.perf_counter()
        bsz = len(texts)
        tokens_list = []
        for text, pt in zip(texts, prompt_tokens_list):
            tokens_list.append(np.concatenate([np.asarray(pt, np.int32),
                                               self.tokenizer(text)]))
        codes_list = [np.asarray(c, np.int32) for c in prompt_codes_list]
        if self.mesh is not None:
            # Pad the batch to a multiple of the 'data' axis (repeat row 0; the
            # extra rows' outputs are dropped below).
            pad_rows = (-bsz) % self.mesh.shape.get('data', 1)
            tokens_list = tokens_list + [tokens_list[0]] * pad_rows
            codes_list = codes_list + [codes_list[0]] * pad_rows
        ttm = max(len(t) for t in tokens_list)
        pm = max(len(c) for c in codes_list)
        if bucket:
            ttm = bucket_len(self.config.bucket_sizes, ttm)
            pm = bucket_len(self.config.bucket_sizes, pm)
        tokens = np.stack([np.pad(t, (0, ttm - len(t))) for t in tokens_list])
        codes = np.stack([np.pad(c, ((0, pm - len(c)), (0, 0))) for c in codes_list])
        tokens_lens = np.asarray([len(t) for t in tokens_list], np.int32)
        p_lens = np.asarray([len(c) for c in codes_list], np.int32)

        # decode_params = int8-quantized view under weight_dtype='int8'
        # (mesh-compatible: q/scale leaves shard by the Megatron rules).
        ar_p, nar_p, cod_p = (self.ar.decode_params, self.nar.params,
                              self.codec.dec_params)
        if override_params is not None:
            o_ar, o_nar = override_params
            ar_p = o_ar if o_ar is not None else ar_p
            nar_p = o_nar if o_nar is not None else nar_p
        inputs = (jnp.asarray(tokens), jnp.asarray(tokens_lens),
                  jnp.asarray(codes), jnp.asarray(p_lens))
        if self.mesh is not None:
            ar_p, nar_p, cod_p = self._mesh_params(ar_p, nar_p, cod_p)
            from .parallel import device_put_global, replicated, shard_batch
            if 'data' in self.mesh.axis_names:
                inputs = shard_batch(self.mesh, inputs)
            else:                      # pure-TP ('model',) mesh: replicate rows
                rep = replicated(self.mesh)
                inputs = tuple(device_put_global(a, rep) for a in inputs)
        wavs, gen_lens, out_codes = self._fused_jit(ar_p, nar_p, cod_p,
                                                    *inputs, rng)
        wavs = np.asarray(wavs)                  # the single host fetch
        gen_lens = np.asarray(gen_lens)
        out_codes = np.asarray(out_codes)
        wall = time.perf_counter() - t0
        results = []
        total_secs = 0.0
        for i in range(bsz):
            n = int(gen_lens[i])
            wav = wavs[i, :n * 320]
            total_secs += len(wav) / self.codec.sampling_rate
            results.append(TTSResult(wav, out_codes[i, :n], 0.0, {'batched': wall}))
        rtf = wall / max(total_secs, 1e-9)
        for r in results:
            r.rtf = rtf                          # aggregate RTF across the batch
        return results

    def synthesize_fused(self, text: str, prompt_tokens, prompt_codes,
                         rng: jax.Array | None = None,
                         bucket: bool = True) -> TTSResult:
        """Single-dispatch pipeline: one jit call, one host fetch (serving path).

        Greedy outputs match ``synthesize`` exactly; at temperature > 0 the NAR
        stage sampling consumes rng in padded-buffer layout, so sampled codes differ
        from the staged path in rng stream only (same distribution).
        """
        return self.batch_synthesize([text], [prompt_tokens], [prompt_codes],
                                     rng=rng, bucket=bucket)[0]

    def synthesize_streaming(self, text: str, prompt_tokens, prompt_codes,
                             chunk_frames: int = 75, lookahead_frames: int = 38,
                             rng: jax.Array | None = None, bucket: bool = True):
        """Generator of 24 kHz float32 waveform chunks while the AR decode runs.

        Streams long-form synthesis: time-to-first-audio drops from the full
        decode to ~(prefill + (chunk+lookahead) AR steps + one NAR/codec pass).
        The AR token stream is computed in on-device segments (models.ar
        .DecodeStream) and is bit-identical to the non-streamed decode; a frame
        is EMITTED once the stream is ``lookahead_frames`` past it, refined by a
        NAR pass over the prefix generated so far.

        Approximation bound: the NAR is bidirectional, so a frame's refinement
        can still change while new context arrives; ``lookahead_frames``
        (default 38 ≈ 0.5 s) bounds how much future context an emitted frame has
        seen.  The codec decode itself is causal (LSTM left-to-right + bounded
        transposed-conv overlap), so emitted samples are exact given their
        codes.  With ``lookahead_frames >= max_audio_len`` there is a single
        emission equal to ``synthesize_fused`` bit-for-bit
        (tests/test_streaming.py).  Requires num_beams == 1 (enforced by
        swapping the config; params are shared).

        Validation and setup run at CALL time (a plain method returning the
        generator), so bad arguments raise immediately rather than at first
        iteration — ``chunk_frames <= 0`` would otherwise spin forever.
        """
        import dataclasses

        from .models.ar import DecodeStream

        if int(chunk_frames) < 1:
            raise ValueError(f'chunk_frames must be >= 1, got {chunk_frames}')
        if int(lookahead_frames) < 0:
            raise ValueError(
                f'lookahead_frames must be >= 0, got {lookahead_frames}')
        if rng is None:
            rng = jax.random.key(self.config.seed)
        rng_ar, rng_nar = jax.random.split(jnp.asarray(rng))

        self._ensure_stream_models()
        tokens = np.concatenate([np.asarray(prompt_tokens, np.int32),
                                 self.tokenizer(text)])
        pcodes = np.asarray(prompt_codes, np.int32).reshape(
            -1, self.config.num_quantizers)
        stream = DecodeStream(self._stream_ar, tokens, pcodes, rng=rng_ar,
                              bucket=bucket)
        emitter = _ChunkEmitter(self, tokens, pcodes, lookahead_frames,
                                rng_nar, bucket=bucket)

        def chunks():
            while True:
                new = stream.advance(chunk_frames)
                for wav in emitter.push(new, stream.finished):
                    yield wav
                if stream.finished:
                    return

        return chunks()

    def synthesize_longform(self, text: str, prompt_tokens, prompt_codes,
                            carry: str = 'prompt', max_chain_frames: int = 450,
                            chunk_frames: int = 75, lookahead_frames: int = 38,
                            rng: jax.Array | None = None, bucket: bool = True):
        """Generator of 24 kHz waveform chunks for UNBOUNDED text.

        ``max_audio_len`` bounds one AR decode, so a paragraph fed to
        ``synthesize_streaming`` would truncate at the budget.  Long-form
        synthesis segments the text into sentences
        (``data.frontend.split_sentences`` — abbreviation/initial-aware, with
        a hard cap against run-ons) and streams each sentence through the
        chunked decode, so total output length is unbounded while every
        decode stays inside one budget.  Chunks stream across sentence
        boundaries with no host-side gap beyond the next sentence's prefill.

        carry='prompt' (default): every sentence is conditioned on the
        original speaker prompt — voice-consistent, immune to drift, and each
        sentence is bit-identical (greedy) to ``synthesize_streaming`` run on
        that sentence alone.
        carry='chain': sentence i+1 is conditioned on [original prompt ++
        sentence i's text and REFINED codes] for prosodic continuity across
        boundaries (VALL-E continuation-style), falling back to the original
        prompt whenever the combined acoustic prompt would exceed
        ``max_chain_frames`` (keeps the prefill bounded and the voice
        anchored).  Chained codes come from the emitter's final full-context
        NAR refinement, so the next sentence hears real acoustics, not raw
        first-codebook tokens.

        Per-sentence rng is ``fold_in(rng, sentence_index)`` — sampled output
        for sentence i does not depend on how earlier sentences' decodes
        consumed the stream.  No reference counterpart (the reference has no
        serving or long-form path; its generate is one bounded loop,
        /root/reference/valle/models/valle_ar.py:92-180).
        """
        from .data.frontend import split_sentences
        from .models.ar import DecodeStream

        if carry not in ('prompt', 'chain'):
            raise ValueError(f"carry must be 'prompt' or 'chain', got {carry!r}")
        if int(chunk_frames) < 1:
            raise ValueError(f'chunk_frames must be >= 1, got {chunk_frames}')
        if int(lookahead_frames) < 0:
            raise ValueError(
                f'lookahead_frames must be >= 0, got {lookahead_frames}')
        sentences = split_sentences(text)
        if rng is None:
            rng = jax.random.key(self.config.seed)
        rng = jnp.asarray(rng)
        self._ensure_stream_models()
        nq = self.config.num_quantizers
        base_tokens = np.asarray(prompt_tokens, np.int32)
        base_codes = np.asarray(prompt_codes, np.int32).reshape(-1, nq)

        def chunks():
            cur_tokens, cur_codes = base_tokens, base_codes
            for i, sent in enumerate(sentences):
                r_ar, r_nar = jax.random.split(jax.random.fold_in(rng, i))
                sent_tokens = self.tokenizer(sent)
                tokens = np.concatenate([cur_tokens, sent_tokens])
                stream = DecodeStream(self._stream_ar, tokens, cur_codes,
                                      rng=r_ar, bucket=bucket)
                emitter = _ChunkEmitter(self, tokens, cur_codes,
                                        lookahead_frames, r_nar, bucket=bucket)
                while True:
                    new = stream.advance(chunk_frames)
                    for wav in emitter.push(new, stream.finished):
                        yield wav
                    if stream.finished:
                        break
                if carry == 'chain' and emitter.last_codes is not None:
                    chained = np.concatenate([base_codes, emitter.last_codes])
                    if len(chained) <= max_chain_frames:
                        cur_tokens = np.concatenate([base_tokens, sent_tokens])
                        cur_codes = chained
                    else:
                        cur_tokens, cur_codes = base_tokens, base_codes

        return chunks()

    def _ensure_stream_models(self) -> None:
        """Lazy-init the streaming models (a num_beams=1 AR sibling sharing
        params + the per-chunk NAR→wav program); idempotent and thread-safe.
        Shared by ``synthesize_streaming`` and the continuous-batching
        ``StreamHub``."""
        import dataclasses

        with self._stream_init_lock:
            # Under the lock: concurrent streams (serve.TTSServer max_streams>1)
            # must not race the lazy init into duplicate models/jit caches.
            if getattr(self, '_stream_ar', None) is None:
                # Streaming default: force a fused-decode cache chunk so the
                # first-audio latency stops scaling with the FULL cache width
                # (max_audio_len) — early steps re-read only the occupied
                # chunk(s) (r2 VERDICT item 9; the clamped chunk index map is
                # the prefix skip).  Explicit decode_chunk configs win.
                chunk = self.config.decode_chunk
                if chunk == 0 and self.config.max_audio_len >= 1024:
                    chunk = 512
                cfg1 = dataclasses.replace(self.config, num_beams=1,
                                           decode_chunk=chunk)
                prec = self.config.matmul_precision

                def _nar_wav(nar_p, cod_p, tokens, tl, pcodes, pl, first_layer,
                             gen_lens, r):
                    with jax.default_matmul_precision(prec):
                        codes = nar_mod._generate_fn(nar_p, tokens, tl, pcodes,
                                                     pl, first_layer, gen_lens,
                                                     r, self.config)
                        wav = codec_mod.decode(cod_p, codes.transpose(0, 2, 1))
                    return wav.astype(jnp.float32), codes

                from .aot import cached_jit
                self._nar_wav_jit = cached_jit(_nar_wav, tag='tts_stream_narwav',
                                               extra_key=self._cfg_key)
                # Assign _stream_ar LAST: it is the lazy-init sentinel.
                self._stream_ar = ValleAR(cfg1, params=self.ar.params)
        if self._stream_ar.params is not self.ar.params:
            # tts.ar.load() (or any params rebind) must reach streaming too —
            # a stale _stream_ar would silently synthesize with old weights.
            self._stream_ar.params = self.ar.params
        if self.config.weight_dtype in ('int8', 'int4'):
            # Share the main model's quantized view — a second
            # quantize_decode_params would hold a duplicate int8 param tree
            # on device (~100 MB at 204M) for the process lifetime.  Re-synced
            # every call so params/transformer rebinds propagate.
            self._stream_ar._qdecode = self.ar.decode_params
            self._stream_ar._qdecode_src = (
                self._stream_ar.params, self._stream_ar.params['transformer'])

    def synthesize(self, text: str, prompt_tokens, prompt_codes,
                   rng: jax.Array | None = None) -> TTSResult:
        """Full pipeline.  prompt_codes: (T, num_quantizers) from prepare_prompt."""
        if rng is None:
            rng = jax.random.key(self.config.seed)
        ar_rng, nar_rng = jax.random.split(jnp.asarray(rng))
        timings: dict[str, float] = {}

        t0 = time.perf_counter()
        target_tokens = self.tokenizer(text)
        timings['frontend'] = time.perf_counter() - t0

        t0 = time.perf_counter()
        first_layer = np.asarray(self.ar.generate(
            jnp.asarray(prompt_tokens), jnp.asarray(prompt_codes),
            jnp.asarray(target_tokens), rng=ar_rng))
        timings['ar_decode'] = time.perf_counter() - t0

        t0 = time.perf_counter()
        codes = np.asarray(self.nar.generate(
            jnp.asarray(prompt_tokens), jnp.asarray(prompt_codes),
            jnp.asarray(target_tokens), jnp.asarray(first_layer), rng=nar_rng))
        timings['nar_refine'] = time.perf_counter() - t0

        t0 = time.perf_counter()
        wav = np.asarray(self.codec.decode(codes.T))
        timings['codec_decode'] = time.perf_counter() - t0

        audio_secs = len(wav) / self.codec.sampling_rate
        rtf = sum(timings.values()) / max(audio_secs, 1e-9)
        return TTSResult(wav, codes, rtf, timings)

    def __call__(self, text: str, prompt_audio, prompt_sr: int, prompt_text: str,
                 rng: jax.Array | None = None) -> TTSResult:
        tokens, codes = self.prepare_prompt(prompt_audio, prompt_sr, prompt_text)
        return self.synthesize(text, tokens, codes, rng)


HOP = 320  # EnCodec-24kHz samples per codec frame


def stream_widths(config: ConfigValle) -> list[int]:
    """THE bucketed NAR refinement width grid for streaming prefixes —
    shared by the solo ``_ChunkEmitter`` and the ``StreamHub`` batched
    refine, whose parity surface is exactly these widths.  bucket_sizes
    extended by doublings bounds the compile count at
    len(buckets)+log2(max_new/max_bucket) widths, always ending at max_new."""
    max_new = config.max_audio_len
    widths = [b for b in config.bucket_sizes if b < max_new]
    w = widths[-1] if widths else 0
    while w < max_new:
        w = max_new if w == 0 else min(w * 2, max_new)
        widths.append(w)
    return widths


def finalize_frames(n: int, done: bool, lookahead: int) -> int:
    """Frames safe to emit: everything when the stream ended, else the
    prefix the lookahead margin has finalized (shared emission rule)."""
    return n if done else max(0, n - lookahead)


class _ChunkEmitter:
    """Streaming emission state machine, shared by ``synthesize_streaming``
    and the continuous-batching ``stream_hub.StreamHub`` (one implementation =
    structurally identical semantics): accumulate AR first-codebook tokens,
    and once the stream is ``lookahead_frames`` past a frame, refine the
    prefix with a bucketed NAR→wav pass and emit the newly finalized samples.

    The per-chunk NAR/codec pass runs over a BUCKETED prefix width, not the
    full max_audio_len buffer: the NAR masks every position past gen_lens, so
    widening only adds masked work — early chunks of a long-form stream pay
    for the frames generated so far, not for the whole budget (TTFA at
    max_audio_len=4096 measured 469 ms with the full-width pass; width grid =
    ``stream_widths``).
    """

    HOP = HOP  # EnCodec-24kHz samples per codec frame (module constant)

    def __init__(self, tts: 'ValleTTS', tokens, pcodes, lookahead_frames: int,
                 rng_nar, bucket: bool = True):
        config = tts.config
        self._tts = tts
        self._lookahead = int(lookahead_frames)
        self._rng = rng_nar
        max_new = config.max_audio_len
        # Static NAR input shapes: bucket the prompt dims like batch_synthesize.
        ttm, pm = len(tokens), len(pcodes)
        if bucket:
            ttm = bucket_len(config.bucket_sizes, ttm)
            pm = bucket_len(config.bucket_sizes, pm)
        self._tokens_pad = jnp.asarray(
            np.pad(tokens, (0, ttm - len(tokens)))[None])
        self._pcodes_pad = jnp.asarray(
            np.pad(pcodes, ((0, pm - len(pcodes)), (0, 0)))[None])
        self._tl = jnp.asarray([len(tokens)], jnp.int32)
        self._pl = jnp.asarray([len(pcodes)], jnp.int32)
        self._widths = stream_widths(config)
        self._buf = np.zeros((max_new,), np.int32)
        self._n = 0
        self._emitted = 0
        #: Latest refined codes, (n_generated, num_quantizers) — the last
        #: refinement the stream ran (full-context once the stream finished).
        #: None until the first emission.  Long-form prompt chaining reads it.
        self.last_codes: np.ndarray | None = None

    def push(self, new, done: bool) -> list[np.ndarray]:
        """Feed newly decoded tokens (+ the stream-finished flag); returns the
        waveform chunks (possibly none) finalized by this push."""
        self._buf[self._n:self._n + len(new)] = new
        self._n += len(new)
        finalize = finalize_frames(self._n, done, self._lookahead)
        out = []
        if finalize > self._emitted:
            width = next(b for b in self._widths if b >= self._n)
            wav, codes = self._tts._nar_wav_jit(
                self._tts.nar.params, self._tts.codec.dec_params,
                self._tokens_pad, self._tl, self._pcodes_pad, self._pl,
                jnp.asarray(self._buf[None, :width]),
                jnp.asarray([self._n], jnp.int32), self._rng)
            out.append(np.asarray(wav)[0, self._emitted * self.HOP:
                                       finalize * self.HOP])
            self.last_codes = np.asarray(codes)[0, :self._n]
            self._emitted = finalize
        return out


class ValleASRPipeline:
    """audio → codec tokens → phoneme transcription (direction-swapped AR model).

    The reference README claims ASR but ships no code (SURVEY §0); this realizes the
    direction-symmetric formulation: source stream = first-codebook codes, target
    stream = phonemes with BOS/EOS at vocab_size/vocab_size+1.
    """

    def __init__(self, config: ConfigValle, ar: ValleAR | None = None,
                 codec: EncodecTPU | None = None,
                 tokenizer: PhonemeTokenizer | None = None):
        import dataclasses
        if config.direction != 'asr':
            config = dataclasses.replace(config, direction='asr')
        self.config = config
        self.ar = ar if ar is not None else ValleAR(config)
        self.codec = codec if codec is not None else EncodecTPU()
        self.tokenizer = tokenizer if tokenizer is not None else PhonemeTokenizer()

    def transcribe(self, audio, sr: int, rng: jax.Array | None = None,
                   output: str = 'text'):
        """One utterance → English text (``output='phonemes'`` for the raw
        ARPAbet symbol list instead)."""
        return self.batch_transcribe([audio], [sr], rng, output=output)[0]

    def batch_transcribe(self, audios: list, srs: list[int],
                         rng: jax.Array | None = None, output: str = 'text'):
        """Batched transcription (BASELINE config #5): all utterances' codec tokens
        decode through ONE on-device loop via ValleAR.generate_batch; per-item masks
        keep each result identical to a solo decode.

        ``output='text'`` (default) inverts the decoded phoneme stream to words
        through the bundled lexicon (exact match → Viterbi segmentation →
        hyphen-joined raw ARPAbet for OOV spans; data/lexicon.invert_phonemes),
        completing BASELINE #5's 'codec tokens → text transcription'.
        ``output='phonemes'`` returns the ARPAbet symbol lists."""
        if output not in ('text', 'phonemes'):
            raise ValueError(f"output must be 'text' or 'phonemes', got {output!r}")
        tokens_list, codes_list = [], []
        for audio, sr in zip(audios, srs):
            wav = normalize_audio(jnp.asarray(audio), sr, self.codec.sampling_rate)
            codes0 = np.asarray(self.codec.encode(wav))[0]   # first codebook (T,)
            # ASR direction: the AR source stream carries codec codes; the decoded
            # stream carries phonemes (BOS/EOS in the phoneme vocab).
            tokens_list.append(jnp.asarray(codes0, jnp.int32))
            codes_list.append(np.zeros((0, self.config.num_quantizers), np.int32))
        outs = self.ar.generate_batch(tokens_list, codes_list, rng=rng)
        if output == 'phonemes':
            return [self.tokenizer.decode(np.asarray(ids)) for ids in outs]
        return [self.tokenizer.to_text(np.asarray(ids)) for ids in outs]


def main(argv=None):
    """CLI: synthesize speech or transcribe audio from the command line.

    TTS:  python -m valle2_tpu.tts -c cfg.json --text "..." \\
            --prompt-wav p.wav --prompt-text "..." -o out.wav \\
            [--ar-ckpt DIR --nar-ckpt DIR --codec-ckpt FILE]
    ASR:  python -m valle2_tpu.tts -c cfg.json --transcribe in.wav
    """
    import argparse
    from pathlib import Path

    from .utils import load_audio, log_info, save_wav

    parser = argparse.ArgumentParser(description='VALL-E TPU synthesis/transcription')
    parser.add_argument('-c', '--config', type=Path, default=None)
    parser.add_argument('--text', type=str, help='Text to synthesize')
    parser.add_argument('--prompt-wav', type=Path, help='Cloning prompt audio (wav)')
    parser.add_argument('--prompt-text', type=str, default='',
                        help='Transcript of the prompt audio')
    parser.add_argument('-o', '--output', type=Path, default=Path('out.wav'))
    parser.add_argument('--transcribe', type=Path, default=None,
                        help='ASR mode: audio file to transcribe')
    parser.add_argument('--ar-ckpt', type=Path, default=None)
    parser.add_argument('--nar-ckpt', type=Path, default=None)
    parser.add_argument('--codec-ckpt', type=Path, default=None,
                        help='Pretrained EnCodec torch checkpoint to convert')
    parser.add_argument('--seed', type=int, default=None)
    parser.add_argument('--compile-cache', type=Path, default=None,
                        help='Persistent XLA compilation cache dir (also '
                             '$VALLE2_COMPILE_CACHE / config.compile_cache_dir)')
    parser.add_argument('--aot-cache', type=Path, default=None,
                        help='AOT executable cache dir: re-run CLIs load '
                             'serialized executables in ms instead of '
                             're-compiling (also $VALLE2_AOT_CACHE / '
                             'config.aot_cache_dir)')
    args = parser.parse_args(argv)

    config = ConfigValle.from_json(args.config) if args.config else ConfigValle()
    from .aot import enable_aot_cache
    from .compile_cache import enable_compilation_cache
    enable_compilation_cache(args.compile_cache, fallback=config.compile_cache_dir)
    enable_aot_cache(args.aot_cache, fallback=config.aot_cache_dir)
    if args.seed is not None:
        config.seed = args.seed
    codec = EncodecTPU(checkpoint=str(args.codec_ckpt) if args.codec_ckpt else None,
                       decode_dtype=config.dtype)

    if args.transcribe is not None:
        asr = ValleASRPipeline(config, codec=codec)
        if args.ar_ckpt:
            asr.ar.load(args.ar_ckpt)
        wav = np.asarray(load_audio(args.transcribe, target_sr=codec.sampling_rate))
        print(asr.transcribe(wav, codec.sampling_rate))
        return

    assert args.text and args.prompt_wav, '--text and --prompt-wav required for TTS'
    tts = ValleTTS(config, codec=codec)
    if args.ar_ckpt:
        tts.ar.load(args.ar_ckpt)
    if args.nar_ckpt:
        tts.nar.load(args.nar_ckpt)
    prompt = np.asarray(load_audio(args.prompt_wav, target_sr=codec.sampling_rate))
    tokens, codes = tts.prepare_prompt(prompt, codec.sampling_rate, args.prompt_text)
    result = tts.synthesize_fused(args.text, tokens, codes)
    save_wav(args.output, result.waveform, codec.sampling_rate)
    log_info('Wrote %s (%.2f s audio, RTF %.4f)', args.output,
             len(result.waveform) / codec.sampling_rate, result.rtf)


if __name__ == '__main__':
    main()
