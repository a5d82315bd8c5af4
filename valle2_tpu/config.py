"""Configuration for the TPU-native VALL-E framework.

Public surface mirrors the reference config (``/root/reference/valle/config.py:7-99``):
same field names, defaults, derived properties (``quantization_factor``, ``bos_token``,
``eos_token``) and loaders (``from_dict`` / ``from_json``), so reference JSON configs
load unchanged.  TPU-specific knobs (dtype, mesh shape, kernel flags, bucketing) are
additive and default to values that preserve reference behaviour.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Literal


@dataclass
class ConfigValle:
    # Data
    dataset: str = field(default='keithito/lj_speech', metadata={'help': 'Hugging Face dataset'})
    num_workers: int = field(default=4, metadata={'help': 'Number of data workers'})

    # Input features
    vocab_size: int = field(default=256, metadata={'help': 'Text/phoneme vocab size'})
    num_audio_tokens: int = field(default=1024, metadata={'help': 'Audio codebook size'})
    num_quantizers: int = field(
        default=8, metadata={'help': 'Number of residual quantizer levels in the codec'}
    )
    sampling_rate: int = field(default=16000, metadata={'help': 'Sampling rate'})
    polling_factor: int = field(default=320, metadata={'help': 'Codec hop size'})

    # Model
    d_model: int = field(default=256, metadata={'help': 'Model dimension'})
    n_heads: int = field(default=4, metadata={'help': 'Number of attention heads'})
    dim_feedforward: int = field(default=1024, metadata={'help': 'FFN hidden dimension'})
    dropout: float = field(default=0.1, metadata={'help': 'Dropout rate'})
    activation: Literal['relu', 'gelu'] = field(
        default='relu',
        metadata={'help': 'Activation (kept for config parity; FFN uses GELU, see Q8)'},
    )
    num_layers: int = field(default=8, metadata={'help': 'Number of transformer layers'})
    norm: Literal['AdaptiveLayerNorm', 'LayerNorm'] = field(
        default='AdaptiveLayerNorm', metadata={'help': 'Normalization layer'}
    )

    # Optimizer
    lr: float = field(default=1e-4, metadata={'help': 'Learning rate'})
    lr_warmup: int = field(default=1000, metadata={'help': 'LR warmup / cosine period steps'})
    betas: tuple = field(default=(0.9, 0.98), metadata={'help': 'Adam betas'})
    weight_decay: float = field(default=0.1, metadata={'help': 'Weight decay'})
    use_fused_adam: bool = field(
        default=True, metadata={'help': 'Kept for parity; optax adamw is always fused under XLA'}
    )
    gradient_clip_val: float = field(default=1.0, metadata={'help': 'Global-norm grad clip'})
    grad_accum: int = field(default=1, metadata={'help': 'Gradient accumulation steps'})

    # Generation
    max_audio_len: int = field(default=1024, metadata={'help': 'Max decode steps'})
    num_beams: int = field(default=4, metadata={'help': 'Best-of-N sampling replicas'})
    use_kv_cache: bool = field(default=True, metadata={'help': 'Use KV cache for decode'})
    top_k: int = field(default=50, metadata={'help': 'Top-k for sampling'})
    tok_p: float = field(default=1.0, metadata={'help': 'Top-p (reference spells it tok_p)'})
    temperature: float = field(default=1.0, metadata={'help': 'Temperature (0 => greedy argmax)'})
    length_penalty: float = field(default=1.0, metadata={'help': 'Length penalty'})

    # Training
    seed: int = field(default=42, metadata={'help': 'Seed'})
    batch_size: int = field(default=4, metadata={'help': 'Global batch size'})
    valid_batch_size: int = field(default=1, metadata={'help': 'Validation batch size'})
    max_steps: int = field(default=1000, metadata={'help': 'Max optimizer steps'})
    log_every_n_steps: int = field(default=100, metadata={'help': 'Log interval'})
    ckpt_path: Path = field(default=Path('models/checkpoints'), metadata={'help': 'Ckpt dir'})
    log_path: Path = field(default=Path('models/logs'), metadata={'help': 'Log dir'})

    # ---- TPU-native additions (absent from the reference) ----
    dtype: str = field(
        default='float32',
        metadata={'help': 'Activation/compute dtype: float32 (parity) or bfloat16 (speed)'},
    )
    param_dtype: str = field(default='float32', metadata={'help': 'Parameter dtype'})
    matmul_precision: str = field(
        default='default',
        metadata={'help': "jax matmul precision: 'default'|'high'|'highest' (parity runs)"},
    )
    mask_loss_pads: bool = field(
        default=True,
        metadata={'help': 'Mask padded positions out of the loss (reference includes them, Q6)'},
    )
    use_flash_attention: bool | str = field(
        default='auto',
        metadata={'help': "Pallas flash-attention kernel for training and AR prefill: "
                          "True | False | 'auto' (on when the backend is TPU; the jnp "
                          'materialized-bias path is the fallback elsewhere)'},
    )
    remat: bool = field(
        default=False, metadata={'help': 'jax.checkpoint each transformer layer (saves HBM)'}
    )
    train_scan_unroll: int = field(
        default=1,
        metadata={'help': 'lax.scan unroll factor for the training-time layer stack '
                          '(trades compile time for less per-layer scan overhead; '
                          'inference paths always fully unroll)'},
    )
    train_rng_impl: Literal['threefry2x32', 'rbg'] = field(
        default='rbg',
        metadata={'help': "PRNG for training randomness (dropout masks, NAR stage "
                          "draw): 'rbg' uses the TPU hardware generator — threefry "
                          'mask generation measured ~12% of the 204M step time. '
                          'Affects only the training noise stream, never parity'},
    )
    mesh_data: int = field(default=1, metadata={'help': 'Data-parallel mesh axis size'})
    mesh_model: int = field(default=1, metadata={'help': 'Tensor-parallel mesh axis size'})
    mesh_pipe: int = field(
        default=1,
        metadata={'help': 'Pipeline-parallel mesh axis size: the layer stack '
                          'splits into mesh_pipe contiguous stages and '
                          'microbatches stream through them (GPipe schedule, '
                          'parallel/pipeline.py). Composes with mesh_data, '
                          'zero1, grad_accum, lora, and mesh_model (manual '
                          'Megatron TP within each stage — DP x PP x TP)'},
    )
    pp_microbatches: int = field(
        default=1,
        metadata={'help': 'Pipeline microbatches per step under mesh_pipe > 1; '
                          'bubble fraction is (P-1)/(M+P-1), so use >= 4x the '
                          'stage count. Clamped per trace to divide the '
                          'per-data-shard batch'},
    )
    mesh_ctx: int = field(
        default=1,
        metadata={'help': 'Context-parallel mesh axis size: the training '
                          'SEQUENCE shards over a ctx axis and attention '
                          'runs the exact ring schedule (K/V blocks rotate '
                          'via ppermute; parallel/ring.py + context.py) — '
                          'activation memory per chip scales 1/ctx for '
                          'long-context training. Composes with mesh_data; '
                          'exclusive with mesh_model/mesh_pipe/lora'},
    )
    pp_schedule: Literal['gpipe', '1f1b'] = field(
        default='gpipe',
        metadata={'help': "Pipeline schedule: 'gpipe' (autodiff backward — "
                          'activation liveness grows with pp_microbatches M) '
                          "or '1f1b' (one-forward-one-backward with recompute "
                          '— liveness bounded at ~2P stage inputs regardless '
                          'of M, so M scales for bubble amortization without '
                          'scaling memory; parallel/pipeline_1f1b.py). Same '
                          'gradients either way (parity-tested)'},
    )
    bucket_sizes: tuple = field(
        default=(128, 256, 384, 512, 768, 1024),
        metadata={'help': 'Static sequence-length buckets for the collate path'},
    )
    direction: Literal['tts', 'asr'] = field(
        default='tts',
        metadata={'help': 'tts: phonemes->codes. asr: codes->phonemes (streams swapped)'},
    )
    schedule: Literal['cosine_restarts', 'warmup_cosine', 'constant'] = field(
        default='cosine_restarts',
        metadata={'help': 'LR schedule; cosine_restarts mirrors the reference '
                          'CosineAnnealingWarmRestarts(T_0=lr_warmup)'},
    )
    ckpt_every_n_steps: int = field(
        default=500, metadata={'help': 'Orbax checkpoint interval (steps)'}
    )
    ignore_eos: bool = field(
        default=False,
        metadata={'help': 'Decode exactly max_audio_len steps (benchmarking)'},
    )
    kv_cache_dtype: str = field(
        default='bfloat16',
        metadata={'help': "Decode KV cache storage: 'float32' | 'bfloat16' | 'int8' "
                          '(per-slot max-abs scales; halves attention HBM traffic — '
                          'decode is cache-bandwidth-bound)'},
    )
    codec_ckpt: str = field(
        default='',
        metadata={'help': 'Pretrained EnCodec torch checkpoint for the data '
                          'pipeline (converted on load, codec/convert.py). '
                          'Empty = random-init codec: pipeline tests only — '
                          'real training MUST set this or the audio tokens '
                          'have no correspondence to the serving codec'},
    )
    codes_cache_dir: str = field(
        default='',
        metadata={'help': 'Persistent codec-token cache directory: precomputed '
                          'codes/tokens are saved keyed by (dataset fingerprint, '
                          'codec weight hash, frontend version) and reloaded in '
                          'later runs with ZERO re-encodes.  Empty = in-RAM '
                          'memoization only (re-encodes each process)'},
    )
    keep_checkpoints: int = field(
        default=0,
        metadata={'help': 'Retention: keep only the newest N completed '
                          'checkpoint dirs per model, pruning older ones after '
                          'each successful save (the reference accumulates '
                          'every save).  0 = keep all'},
    )
    async_checkpoint: bool = field(
        default=True,
        metadata={'help': 'Checkpoint saves return once the device→host copy '
                          'lands; serialization/IO runs on a background thread '
                          '(orbax AsyncCheckpointer) so the step loop never '
                          'blocks on disk.  The trailing save is awaited '
                          'before fit() returns'},
    )
    preempt_checkpoint: bool = field(
        default=True,
        metadata={'help': 'Install a SIGTERM handler during fit(): on '
                          'preemption notice, finish the in-flight micro-step, '
                          'save a checkpoint, and return cleanly so --resume '
                          'continues from it.  False = default signal '
                          'semantics (die, losing progress since the last '
                          'periodic save)'},
    )
    compile_cache_dir: str = field(
        default='',
        metadata={'help': 'Persistent XLA compilation cache directory '
                          '(compile_cache.py): compiled executables are '
                          'serialized so restarted servers / re-run CLIs / '
                          'resumed training jobs deserialize instead of '
                          're-paying minutes of compilation.  Overridable by '
                          '$VALLE2_COMPILE_CACHE and --compile-cache.  '
                          'Empty = disabled (every process recompiles)'},
    )
    aot_cache_dir: str = field(
        default='',
        metadata={'help': 'AOT compiled-executable cache directory (aot.py): '
                          'serving/decode programs are serialized per call '
                          'signature and restarted processes LOAD them (~ms) '
                          'instead of re-tracing + re-lowering + re-compiling '
                          '(minutes) — the layer above compile_cache_dir, '
                          'which still pays trace/lower and a compile-server '
                          'round trip per program.  Overridable by '
                          '$VALLE2_AOT_CACHE and --aot-cache.  '
                          'Empty = disabled'},
    )
    prefetch_batches: int = field(
        default=2,
        metadata={'help': 'Train input pipeline: background-thread device '
                          'prefetch depth (batches staged ahead of the step '
                          'loop; 0 = synchronous host-side iteration)'},
    )
    weight_dtype: str = field(
        default='compute',
        metadata={'help': "Decode/serving weight storage: 'compute' (= dtype) | "
                          "'int8' (W8A8: per-channel weights + dynamic per-token "
                          'activation scales, s8 MXU dots; halves the weight HBM '
                          "stream that bounds large-model decode) | 'int4' "
                          '(W4A16: group-128 scales, packed nibbles, fp '
                          'activations; quarters the weight bytes — for the '
                          'largest serving configs).  Both lossy, so not for '
                          'parity-gate runs; quantize.py'},
    )
    decode_attn_buckets: int = field(
        default=4,
        metadata={'help': 'Decode attention prefix buckets: lax.switch over static '
                          'cache prefixes so each step reads ~only the valid region '
                          '(decode is cache-bandwidth-bound; measured 1.7x on v5e). '
                          'Outputs identical for any value; 1 disables'},
    )
    decode_unroll: int = field(
        default=1,
        metadata={'help': 'AR decode steps per while_loop turn (outputs identical '
                          'for any K; amortizes loop-turn overhead on runtimes '
                          'where that dominates — benchmark per target)'},
    )
    decode_chunk: int = field(
        default=0,
        metadata={'help': 'Fused-decode cache chunk (slots per grid step). '
                          '0 = auto (whole-S when it fits the VMEM block cap). '
                          'A forced chunk bounds per-step HBM traffic by the '
                          'OCCUPIED prefix instead of the full cache width — '
                          'streaming sets this so first-audio latency stops '
                          'scaling with max_audio_len'},
    )
    zero1: bool = field(
        default=False,
        metadata={'help': 'ZeRO stage 1: shard the optimizer state (adam '
                          'moments, 2x params in f32) over the data axis — '
                          'each chip holds 1/mesh_data of it; XLA turns the '
                          'grad psum + shard slice into a reduce-scatter and '
                          'all-gathers the updates over ICI. Bit-equivalent '
                          'training (placement only); needs mesh_data > 1'},
    )
    sequence_parallel: bool = field(
        default=False,
        metadata={'help': 'Megatron-style sequence parallelism for training '
                          '(Korthikanti et al. 2022): constrain the residual '
                          'stream to be sequence-sharded over the model axis '
                          'between blocks, so GSPMD turns each TP all-reduce '
                          'into a reduce-scatter + all-gather pair and the '
                          'norm/dropout/residual activations cost 1/mesh_model '
                          'per chip. Bit-equivalent math (sharding hints '
                          'only); needs mesh_model > 1'},
    )
    speculative_k: int = field(
        default=0,
        metadata={'help': 'N-gram (prompt-lookup) speculative decoding: verify '
                          'blocks of K tokens per step — 1 model-guaranteed '
                          'token + K-1 drafts continued from the most recent '
                          'n-gram match in the tokens generated so far. '
                          'Greedy (temperature=0): bit-identical outputs. '
                          'Sampled: exact rejection sampling — same output '
                          'DISTRIBUTION as the plain loop, different rng '
                          'draws. Requires num_beams=1; 0 disables. Wins '
                          'scale with token repetitiveness (silence/'
                          'sustained sounds in codec streams)'},
    )
    speculative_ngram: int = field(
        default=3,
        metadata={'help': 'Match length for speculative drafting: the draft '
                          'continues the latest earlier occurrence of the '
                          'last N generated tokens. Only draft quality '
                          '(acceptance rate) depends on this, never outputs'},
    )
    lora_rank: int = field(
        default=0,
        metadata={'help': 'LoRA fine-tuning (voice/domain adaptation): adapter '
                          'rank r; 0 = ordinary full training.  With r > 0 the '
                          'trainer optimizes ONLY the adapters (base weights '
                          'frozen bit-for-bit), merging w + (alpha/r)·A@B '
                          'inside the jitted step; models/serving load the '
                          'fine-tune checkpoint and get merged dense weights '
                          '(lora.py)'},
    )
    lora_alpha: float = field(
        default=16.0,
        metadata={'help': 'LoRA scaling numerator: merged delta = (alpha/rank)'
                          '·A@B'},
    )
    lora_targets: tuple = field(
        default=('qkv', 'out', 'lin1', 'lin2'),
        metadata={'help': 'Param-dict keys LoRA adapters attach to (transformer '
                          "linears by default; add 'proj' for output heads + "
                          'AdaLN conditioning projections)'},
    )
    lora_base: str = field(
        default='',
        metadata={'help': 'Base checkpoint to fine-tune from (a model params '
                          'dir or a Trainer step dir); empty = fresh init '
                          '(adapters over random weights — tests only)'},
    )
    nar_corrupt_p: float = field(
        default=0.0,
        metadata={'help': 'NAR conditioning-input corruption rate: during '
                          'training, each suffix conditioning code (position '
                          'past the acoustic prefix, any quantizer < stage) is '
                          'replaced by a uniform random symbol with this '
                          'probability while TARGETS stay clean — teaching the '
                          'NAR to REFINE imperfect codebook-0 input (its real '
                          'serving regime: AR output is imperfect, reference '
                          'valle_nar.py:107-165 is a refiner). 0 = reference '
                          'behaviour (train on ground truth only)'},
    )
    use_fused_decode: bool | str = field(
        default='auto',
        metadata={'help': "Pallas fused whole-stack decode step: True | False | "
                          "'auto' (on for TPU serving — requires the per-layer "
                          "KV block to fit VMEM and matmul_precision != "
                          "'highest' so parity-gate runs keep the exact unfused "
                          'path; int8 KV caches are supported, dequantized '
                          'in-kernel). Measured +12-16% decode tok/s '
                          '(BENCHMARKS.md r2)'},
    )

    def __post_init__(self):
        if self.dataset is None:
            raise ValueError('Dataset must be provided')
        if self.norm not in ('AdaptiveLayerNorm', 'LayerNorm'):
            raise ValueError('Normalization layer must be AdaptiveLayerNorm or LayerNorm')
        if self.activation not in ('relu', 'gelu'):
            raise ValueError('Activation function must be relu or gelu')
        if self.weight_dtype not in ('compute', 'int8', 'int4'):
            raise ValueError("weight_dtype must be 'compute', 'int8' or 'int4'")
        if self.pp_schedule not in ('gpipe', '1f1b'):
            # Literal annotations are not enforced at runtime; a typo here
            # would silently select GPipe and blow the activation budget the
            # user sized for 1F1B.
            raise ValueError("pp_schedule must be 'gpipe' or '1f1b', got "
                             f'{self.pp_schedule!r}')
        self.ckpt_path = Path(self.ckpt_path)
        self.log_path = Path(self.log_path)
        self.betas = tuple(self.betas)
        self.bucket_sizes = tuple(self.bucket_sizes)
        self.lora_targets = tuple(self.lora_targets)

    def ensure_dirs(self) -> None:
        """Create checkpoint/log dirs.

        The reference does this eagerly in ``__post_init__`` (config.py:74-77); we defer
        to trainer startup so constructing a config has no filesystem side effects.
        """
        self.ckpt_path.mkdir(parents=True, exist_ok=True)
        self.log_path.mkdir(parents=True, exist_ok=True)

    # Derived properties — reference config.py:79-89.
    @property
    def quantization_factor(self) -> int:
        return self.sampling_rate // self.polling_factor

    @property
    def bos_token(self) -> int:
        return self.num_audio_tokens + 1

    @property
    def eos_token(self) -> int:
        return self.num_audio_tokens

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def flash_enabled(self) -> bool:
        """Resolve ``use_flash_attention``.  'auto' = on iff the backend is TPU:
        with bf16-input MXU dots the kernel wins at every scale measured on v5e
        (BENCHMARKS.md r2: d=256 42.3 → 27.0 ms/step; at d=1024 the bias path
        fails to compile outright — materialized (b, h, s, s) scores).
        Elsewhere the kernel only falls back to the slow interpreter."""
        if self.use_flash_attention == 'auto':
            import jax
            return jax.default_backend() == 'tpu'
        return bool(self.use_flash_attention)

    @classmethod
    def from_dict(cls, hparams_dict: dict) -> 'ConfigValle':
        """Build from a dict; unknown keys are ignored (reference raises — we accept
        configs written for either implementation)."""
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in hparams_dict.items() if k in names})

    @classmethod
    def from_json(cls, json_file) -> 'ConfigValle':
        with open(json_file, encoding='utf-8') as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d['ckpt_path'] = str(d['ckpt_path'])
        d['log_path'] = str(d['log_path'])
        return d


def bucket_len(bucket_sizes, n: int) -> int:
    """Smallest bucket >= n, or n itself when none fits — THE bucketing rule
    shared by every padding path (AR/NAR generate, fused TTS, streaming), so
    compile-cache behavior can never diverge between them."""
    for b in bucket_sizes:
        if n <= b:
            return b
    return n
