"""Engine & runtime configuration with CLI > env > file precedence.

TPU-native analog of the reference's governed config surface:
  - `EngineConfig::apply_runtime_config_snapshot`
    (crates/ferrum-types/src/config.rs:62-170): a typed snapshot is
    installed process-wide so model code never reads os.environ directly.
  - env registry (`docs/runtime-env-registry.tsv`): every recognized env
    var is declared here in ENV_REGISTRY with type + default; tests
    assert no stray os.environ reads elsewhere in the package.

Sources merge with fixed precedence: CLI overrides > FERRUM_* env vars >
ferrum.toml [runtime] section > dataclass defaults.
"""

from __future__ import annotations

import dataclasses
import os
import threading
from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, Mapping, Optional, Tuple

from .types import InvalidRequestError

# ---------------------------------------------------------------------------
# Env registry: name -> (field path, python type, description)
# ---------------------------------------------------------------------------

ENV_REGISTRY: Dict[str, Tuple[str, type, str]] = {
    "FERRUM_MAX_NUM_SEQS": ("max_num_seqs", int, "decode slot count (static batch)"),
    "FERRUM_MAX_NUM_BATCHED_TOKENS": (
        "max_num_batched_tokens", int, "per-iteration token budget"),
    "FERRUM_KV_MAX_BLOCKS": ("kv_num_blocks", int, "paged KV block capacity"),
    "FERRUM_KV_BLOCK_SIZE": ("kv_block_size", int, "tokens per KV block"),
    "FERRUM_MAX_MODEL_LEN": ("max_model_len", int, "max sequence length"),
    "FERRUM_PREFILL_CHUNK": ("prefill_chunk_size", int, "max prefill chunk tokens"),
    "FERRUM_ENABLE_PREFIX_CACHE": ("enable_prefix_cache", bool, "block-hash prefix reuse"),
    "FERRUM_PREFIX_CACHE_POLICY": ("prefix_cache_policy", str, "eviction policy: lru|fifo|clock"),
    "FERRUM_PREFIX_OFFLOAD_MB": ("prefix_offload_mb", int,
                                 "host-RAM budget (MiB) for the compressed "
                                 "prefix offload tier (0 = off; paged layout)"),
    "FERRUM_PREFIX_OFFLOAD_ALGO": ("prefix_offload_algo", str,
                                   "offload compression: none|int8|int4|fp8"),
    "FERRUM_PREFIX_CACHE_BLOCKS": ("prefix_cache_blocks", int,
                                   "linear-layout store extent blocks (-1 auto, 0 off)"),
    "FERRUM_ENABLE_CHUNKED_PREFILL": ("enable_chunked_prefill", bool, ""),
    "FERRUM_SCHEDULER": ("scheduler", str, "continuous|fifo|priority"),
    "FERRUM_KV_DTYPE": ("kv_dtype", str, "bf16|f32|int8"),
    "FERRUM_KV_LAYOUT": ("kv_layout", str,
                         "paged|linear|auto (auto: linear when the "
                         "per-slot reservation fits HBM, else paged)"),
    "FERRUM_DTYPE": ("dtype", str, "activation/weight dtype: bf16|f32"),
    "FERRUM_QUANT": ("quantization", str, "none|gptq_int4|gguf_q4k"),
    "FERRUM_W4A8": ("w4a8", bool,
                    "int8-activation path for int4 matmuls at decode"),
    "FERRUM_W4A8_GD": ("w4a8_gd", str,
                       "group-dot decode kernel mode: off|all|down|mxu"),
    "FERRUM_W4A8_TL": ("w4a8_two_level", bool,
                       "two-level requantize: integer group scales -> "
                       "full-speed int8 MXU at all batch sizes"),
    "FERRUM_SQUEEZE_EMBED": ("squeeze_embeddings", bool,
                             "int8 embeddings + int4 untied lm_head "
                             "(single-chip 30B fit posture)"),
    "FERRUM_FUSE_PROJ": ("fuse_proj", bool,
                         "build-time q|k|v and gate|up fusion "
                         "(single-chip; auto-off under a mesh)"),
    "FERRUM_TP": ("tensor_parallel", int, "tensor-parallel degree (mesh 'model' axis)"),
    "FERRUM_DP": ("data_parallel", int, "data-parallel degree (mesh 'data' axis)"),
    "FERRUM_EP": ("expert_parallel", int, "expert-parallel degree (mesh 'expert' axis)"),
    "FERRUM_SEED": ("seed", int, "base PRNG seed"),
    "FERRUM_SCHEDULER_TRACE_JSONL": ("scheduler_trace_path", str,
                                     "per-iteration scheduler trace JSONL path"),
    "FERRUM_PROFILE_JSONL": ("profile_path", str, "profile event JSONL path"),
    "FERRUM_PROFILE_DETAIL": ("profile_detail", str,
                              "profile detail level: off|basic|debug|full"),
    "FERRUM_PROFILE_SAMPLE_RATE": ("profile_sample_rate", float,
                                   "timed-span sampling rate (full forces 1.0)"),
    "FERRUM_MEMORY_PROFILE_JSONL": ("memory_profile_path", str,
                                    "separate sink for memory snapshots"),
    "FERRUM_SESSION_CACHE_ENTRIES": ("session_cache_entries", int, ""),
    "FERRUM_SESSION_CACHE_TOKENS": ("session_cache_tokens", int, ""),
    "FERRUM_GREEDY_ARGMAX": ("greedy_argmax_device", bool,
                             "sample greedy tokens on device (no logit readback)"),
    "FERRUM_SPEC_DRAFT": ("spec_draft_model", str, "draft model for speculative decoding"),
    "FERRUM_SPEC_K": ("spec_num_tokens", int, "speculative draft length"),
    "FERRUM_DECODE_BUCKETS": ("decode_bucket_spec", str,
                              "decode lane buckets: '' = auto pow2 ladder, "
                              "'max' = full frame, or e.g. '1,8,32'"),
    "FERRUM_DECODE_T_SPEC": ("decode_t_spec", str,
                             "per-bucket window length, e.g. 1:32,8:16"),
    "FERRUM_DECODE_MULTI_STEP": ("decode_multi_step", int,
                                 "decode tokens per device call (lax.scan)"),
    "FERRUM_SLOT_SLACK": ("slot_slack", int,
                          "extra device lanes beyond max_num_seqs so "
                          "admissions never wait on deferred releases"),
    "FERRUM_REFILL_FIRST": ("refill_first", bool,
                            "hold decode while admission waves prefill"),
    "FERRUM_ADAPTIVE_WINDOWS": ("adaptive_windows", bool,
                                "adaptive decode-window lengths (double at "
                                "low occupancy, halve in pileups)"),
    "FERRUM_PIPELINE_DEPTH": ("pipeline_depth", int,
                              "decode dispatch-ahead depth (outstanding "
                              "windows; 1 = classic single pipeline)"),
    "FERRUM_PIPELINE_DECODE": ("pipeline_decode", bool,
                               "keep one decode window in flight "
                               "(overlap host/RTT with device compute)"),
    "FERRUM_MIXED_PREFILL": ("mixed_prefill", bool,
                             "fold one prefill chunk per decode window "
                             "into the window's trunk (rides the "
                             "already-paid weight stream)"),
    "FERRUM_GDN_CHUNKED": ("gdn_chunk_block", int,
                           "GDN prefill blocked-recurrence tile "
                           "(WY-form matmul blocks; 0 = per-position "
                           "sequential scan)"),
    "FERRUM_FUSE_SITES": ("fuse_sites", str,
                          "comma list of build-time fusion sites: "
                          "qkv,gate_up,moe (moe off by default — "
                          "see engine/builder.fuse_projections)"),
}


def _parse_env_value(raw: str, ty: type) -> Any:
    if ty is bool:
        return raw.strip().lower() in ("1", "true", "yes", "on")
    if ty is int:
        return int(raw.strip())
    if ty is float:
        return float(raw.strip())
    return raw


def snapshot_from_env_vars(pairs: Iterable[Tuple[str, str]]) -> Dict[str, Any]:
    """Build a field->value dict from explicit (name, value) pairs.

    Takes an iterator instead of reading os.environ so tests never mutate
    process env (the reference's `from_env_vars` pattern,
    cuda_decode.rs:54-71).
    """
    out: Dict[str, Any] = {}
    for name, raw in pairs:
        entry = ENV_REGISTRY.get(name)
        if entry is None:
            continue
        path, ty, _ = entry
        try:
            out[path] = _parse_env_value(raw, ty)
        except ValueError as e:
            raise InvalidRequestError(f"bad env value {name}={raw!r}: {e}", param=name)
    return out


def snapshot_from_process_env(environ: Optional[Mapping[str, str]] = None) -> Dict[str, Any]:
    env = os.environ if environ is None else environ
    return snapshot_from_env_vars((k, v) for k, v in env.items() if k in ENV_REGISTRY)


def load_toml_runtime(path: str) -> Dict[str, Any]:
    """Read the [runtime] table of a ferrum.toml (ref: ferrum.toml [runtime])."""
    import tomllib

    with open(path, "rb") as f:
        data = tomllib.load(f)
    runtime = data.get("runtime", {})
    out: Dict[str, Any] = {}
    valid = {f.name for f in dataclasses.fields(EngineConfig)}
    for k, v in runtime.items():
        if k in valid:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# EngineConfig
# ---------------------------------------------------------------------------

@dataclass
class EngineConfig:
    """Engine-wide configuration (ref: ferrum-types/src/config.rs:48).

    All shapes that reach the device are derived from these fields and
    are static for the lifetime of the engine (XLA compiles once per
    bucket).
    """

    model: str = ""
    tokenizer: Optional[str] = None

    # --- batching / scheduling ---
    max_num_seqs: int = 32              # decode slots (static device batch)
    max_num_batched_tokens: int = 2048  # per-iteration token budget
    max_model_len: int = 4096
    prefill_chunk_size: int = 512
    enable_chunked_prefill: bool = True
    scheduler: str = "continuous"       # continuous | fifo | priority

    # --- KV cache ---
    kv_num_blocks: int = 0              # 0 = autosize from free HBM
    kv_block_size: int = 32
    kv_dtype: str = "bf16"              # bf16 | f32 | int8
    # "paged": block-table indirection, CoW prefix sharing, preemption by
    #          block pressure (the reference's vLLM-style layout).
    # "linear": every slot owns a contiguous max_model_len region —
    #          attention is a fused dense slice with no gather (the TPU
    #          serving fast path); prefix reuse is copy-based via the
    #          store extent (kv/linear_prefix.py); KV-pressure
    #          preemption doesn't apply (capacity is reserved per slot).
    # "auto":  linear when the per-slot reservation fits the autosized
    #          HBM budget and no explicit kv_num_blocks was pinned,
    #          else paged (the CLI's default; see engine/builder.py).
    kv_layout: str = "paged"
    enable_prefix_cache: bool = True
    # Cache eviction policy (ref: managers/eviction.rs LRU/FIFO/Clock).
    prefix_cache_policy: str = "lru"    # lru | fifo | clock
    # Linear layout only: size (in KV blocks) of the dedicated prefix
    # store extent (kv/linear_prefix.py). -1 = auto (an eighth of the
    # slot pool, capped by measured free HBM), 0 = disable copy-based
    # prefix reuse.
    prefix_cache_blocks: int = -1
    # Paged layout: host-RAM budget (MiB) for the compressed offload
    # tier — evicted prefix blocks spill to host instead of dying
    # (kv/compression.HostOffloadTier; the vLLM swap-space analog).
    # 0 = off (default: device↔host copies cost a tunnel RTT on
    # remotely attached TPUs).
    prefix_offload_mb: int = 0
    prefix_offload_algo: str = "int8"   # none | int8 | int4 | fp8

    # GDN (linear-attention) prefill: blocked WY-form recurrence tile.
    # The intra-block delta rule becomes [tile, tile] MXU matmuls + one
    # triangular solve; only T/tile handoffs stay sequential. 0 falls
    # back to the per-position lax.scan (the parity oracle).
    gdn_chunk_block: int = 64

    # --- numerics / quant ---
    dtype: str = "bf16"
    quantization: str = "none"          # none | gptq_int4 | gguf_q4k
    # w4a8: int4 weights x dynamic-int8 activations on the int8 MXU for
    # decode-sized batches (measured 1.45x over w4a16 at m=32 on v5e;
    # tools/bench_w4a8.py). Divergence-gated in bench/accuracy.py.
    w4a8: bool = True
    # Two-level requantization (QServe-style): group scales become small
    # integers so the int8 MXU path applies at ALL batch sizes (prefill
    # included). Slightly perturbs group scales (requantized weights;
    # divergence-gated). Requires w4a8.
    w4a8_two_level: bool = True
    # Group-dot decode kernel (m <= 64): MXU consumes raw nibbles, the
    # two-level scale/zero move to the output side (exact).
    # off | all | down | mxu; mxu = MXU-assisted unpack (the hi-nibble
    # dot recovered from a dot against raw packed bytes — the VPU does
    # ~2 ops/byte; tools/bench_unpack.py). Default mxu: the window-level
    # A/B on v5e measured 886 vs 802 tok/s c=32 (+10.5%, ITL p95 139 vs
    # 154 ms) over the per-group-f32 decode path.
    w4a8_gd: str = "mxu"
    # Squeeze embeddings to int8 and an untied lm_head to int4 at build
    # time — frees 0.72 GiB on the 30B-A3B flagship, the difference
    # between "cannot fit one v5e at all" and a single-chip run
    # (docs/fit_30b_v5e.md). Off by default: GPTQ checkpoints keep
    # bf16 embeddings and the squeeze adds quantization error at the
    # input/output boundary.
    squeeze_embeddings: bool = False
    # Build-time projection fusion: concat q|k|v and gate|up along the
    # out dim so each layer issues one kernel per site (fixed per-call
    # pipeline spin-up dominates at decode m). Disabled automatically
    # under a mesh (fused weights break per-head TP sharding specs).
    fuse_proj: bool = True
    # Which fusion sites fuse_projections applies (comma list). The
    # moe expert-stack site is OFF by default: fused 48-layer MoE
    # prefill programs hit an unexplained multi-GB HBM transient and
    # OOM a v5e at runtime (engine/builder.fuse_projections docstring).
    fuse_sites: str = "qkv,gate_up"

    # --- parallelism (mesh axes; 1 = off) ---
    tensor_parallel: int = 1
    data_parallel: int = 1
    expert_parallel: int = 1

    # --- sampling / decoding ---
    # Decode steps fused into one device call via lax.scan: sampled
    # tokens feed back on device, so the host syncs once per
    # `decode_multi_step` tokens instead of per token. Essential when
    # dispatch latency is high; overshoot past EOS/stop within a window
    # is discarded host-side.
    decode_multi_step: int = 8
    # Keep one decode window outstanding: window W+1 is dispatched
    # (device-chained from W's final tokens) before W's results are
    # fetched, hiding dispatch RTT + host bookkeeping entirely.
    pipeline_decode: bool = True
    # Dispatch-ahead depth: how many decode windows may be outstanding
    # (dispatched, unfetched) at once. Each dispatch pays a fixed
    # host/transport cost (~16-19 ms on the tunneled chip); depth 2
    # overlaps window N's fetch+bookkeeping under windows N+1/N+2's
    # device time so the device never starves between windows
    # (VERDICT r3 #4: engine c=32 at 69% of device-side tok/s).
    # Token delivery lags by (depth-1) extra windows, so the engine
    # drops to depth 1 at <= 4 active lanes (latency mode).
    pipeline_depth: int = 2
    # Adaptive decode-window lengths: double T at low occupancy (idle
    # queue), halve during admission pileups. Off pins every window to
    # decode_multi_step — fewer compiled variants (each (bucket, T)
    # costs a multi-minute remote compile on the tunneled chip).
    adaptive_windows: bool = True
    # Mixed prefill+decode windows: one slot's prefill chunk rides each
    # decode window's trunk (the weight stream is already paid by the
    # decode steps, so a steady-state slot refill costs ~zero extra HBM
    # traffic and TTFT drops to ~a window). Applies on the linear/win
    # attention path for plain (non-hybrid, non-spec, unguided-seq)
    # lanes; everything else falls back to the standalone batched
    # prefill program. ref: the reference's mixed decode+prefill
    # iteration batches (continuous_engine/inner/batch.rs).
    mixed_prefill: bool = True
    # Hold decode for one iteration while a multi-sequence admission
    # wave prefills at low occupancy: bandwidth-bound decode at half
    # occupancy streams the full weight set for half the tokens, so
    # letting the wave join first is a straight throughput win
    # (engine.step; measured occupancy waste in gates/tpu phase_times).
    refill_first: bool = True
    # Extra device lanes beyond max_num_seqs. A finished sequence's
    # slot/KV release is deferred past the in-flight window (its lanes
    # may still be written); slack lanes let the replacement request
    # admit + prefill IMMEDIATELY instead of waiting ~2 windows for the
    # deferred release — the steady-state TTFT floor under full load.
    # Costs one KV slot region each in the linear layout.
    slot_slack: int = 0
    seed: int = 0
    greedy_argmax_device: bool = True
    spec_draft_model: Optional[str] = None
    spec_num_tokens: int = 4

    # --- decode batch buckets (padded compile sizes) ---
    # "" = auto pow2 ladder 1,2,4,..,max_num_seqs (occupancy-compacted
    # decode windows); "max" = single bucket at max_num_seqs (full slot
    # frame, the pre-bucketing behavior); or an explicit "1,4,16" list.
    decode_bucket_spec: str = ""
    # Per-bucket window length, e.g. "1:32,8:16": low-occupancy buckets
    # run LONGER windows (the fixed per-dispatch cost ~16-19 ms on the
    # tunneled chip dominates single-lane TPOT; at c=1 a T=32 window
    # amortizes it to ~0.5 ms/token). Buckets not listed use
    # decode_multi_step. Exactly ONE T per bucket keeps the compiled-
    # program count identical to the flat default — unlike
    # adaptive_windows, which doubles the variant count. When both are
    # set, the spec wins for its listed buckets.
    decode_t_spec: str = ""

    # --- caches / product ---
    session_cache_entries: int = 64
    session_cache_tokens: int = 8192

    # --- observability (product schema: utils/profile.py; ref
    # observability_profile.rs FerrumObservabilityConfig) ---
    scheduler_trace_path: Optional[str] = None
    profile_path: Optional[str] = None
    profile_detail: str = "basic"      # off|basic|debug|full
    profile_sample_rate: float = 0.01
    memory_profile_path: Optional[str] = None

    def validate(self) -> None:
        if self.max_num_seqs < 1:
            raise InvalidRequestError("max_num_seqs must be >= 1", param="max_num_seqs")
        if self.kv_block_size < 1 or self.kv_block_size & (self.kv_block_size - 1):
            raise InvalidRequestError(
                "kv_block_size must be a positive power of two", param="kv_block_size")
        if self.max_model_len % self.kv_block_size:
            raise InvalidRequestError(
                "max_model_len must be a multiple of kv_block_size",
                param="max_model_len")
        if self.prefill_chunk_size < self.kv_block_size:
            raise InvalidRequestError(
                "prefill_chunk_size must be >= kv_block_size",
                param="prefill_chunk_size")
        if self.max_num_batched_tokens < self.prefill_chunk_size:
            # The scheduler only emits full-cap or whole-remainder chunks
            # (closed compiled-program set); a budget permanently below
            # the cap could never admit a long prompt.
            raise InvalidRequestError(
                "max_num_batched_tokens must be >= prefill_chunk_size",
                param="max_num_batched_tokens")
        if self.scheduler not in ("continuous", "fifo", "priority"):
            raise InvalidRequestError("unknown scheduler", param="scheduler")
        if self.kv_dtype not in ("bf16", "f32", "int8"):
            raise InvalidRequestError("unknown kv_dtype", param="kv_dtype")
        if self.kv_layout not in ("paged", "linear", "auto"):
            raise InvalidRequestError("unknown kv_layout", param="kv_layout")
        if self.profile_detail not in ("off", "basic", "debug", "full"):
            raise InvalidRequestError("unknown profile_detail",
                                      param="profile_detail")
        if not 1 <= self.pipeline_depth <= 4:
            raise InvalidRequestError("pipeline_depth must be in [1, 4]",
                                      param="pipeline_depth")
        if self.quantization not in ("none", "gptq_int4", "gguf_q4k"):
            raise InvalidRequestError("unknown quantization", param="quantization")

    @property
    def decode_buckets(self) -> Tuple[int, ...]:
        """Padded decode batch sizes, ascending; always ends at num_slots
        (max_num_seqs + slot_slack — with slack lanes, more than
        max_num_seqs sequences may decode concurrently while a
        predecessor's release is deferred).

        The TPU analog of the reference's CUDA-graph cache keyed by padded
        batch m (llama_family.rs:36-38): one XLA compilation per bucket.
        Decode windows compact active sequences into the smallest bucket
        that fits, so attention/sampling cost scales with occupancy.
        """
        top = self.num_slots
        if not self.decode_bucket_spec:
            sizes, b = [], 1
            while b < top:
                sizes.append(b)
                b *= 2
            sizes.append(top)
            if top >= 8 and top // 2 in sizes:
                # Measured (tools/bench_lane_sweep.py, v5e, ctx 512):
                # the half-frame bucket's per-lane ctx GATHER costs more
                # than the full ident frame's SLICE (24.5 vs 21.4
                # ms/step at 16/32) — strictly dominated, drop it.
                sizes.remove(top // 2)
            return tuple(sizes)
        if self.decode_bucket_spec == "max":
            return (top,)
        sizes = sorted({int(s) for s in self.decode_bucket_spec.split(",") if s.strip()})
        sizes = [s for s in sizes if 0 < s <= top]
        if not sizes or sizes[-1] != top:
            sizes.append(top)
        return tuple(sizes)

    def t_for_bucket(self, bucket: int) -> int:
        """Decode-window length for a lane bucket: decode_t_spec entry
        if present, else decode_multi_step."""
        base = max(1, self.decode_multi_step)
        if not self.decode_t_spec:
            return base
        for part in self.decode_t_spec.split(","):
            if not part.strip():
                continue
            b, t = part.split(":")
            if int(b) == bucket:
                return max(1, int(t))
        return base

    @property
    def max_blocks_per_seq(self) -> int:
        return self.max_model_len // self.kv_block_size

    @property
    def resolved_prefix_cache_blocks(self) -> int:
        """Store-extent size for the linear-layout prefix cache:
        -1 → a quarter of the slot pool (bounded HBM overhead),
        explicit values pass through."""
        if self.prefix_cache_blocks >= 0:
            return self.prefix_cache_blocks
        return max(self.max_blocks_per_seq,
                   self.num_slots * self.max_blocks_per_seq // 8)

    @property
    def num_slots(self) -> int:
        """Device lane count: max_num_seqs concurrent sequences plus
        slack lanes covering deferred slot releases (see slot_slack)."""
        return self.max_num_seqs + max(0, self.slot_slack)

    @classmethod
    def resolve(
        cls,
        cli_overrides: Optional[Dict[str, Any]] = None,
        environ: Optional[Mapping[str, str]] = None,
        toml_path: Optional[str] = None,
        **base: Any,
    ) -> "EngineConfig":
        """Merge sources with precedence CLI > env > file > defaults.

        ``**base`` is the DEFAULTS layer (lowest precedence): a TOML
        file, the FERRUM_* env registry, and CLI flags each override it
        in turn. (Advisor r3: setdefault here made base beat the file,
        silently ignoring e.g. a TOML-pinned kv_layout.)
        """
        merged: Dict[str, Any] = dict(base)
        if toml_path and os.path.exists(toml_path):
            merged.update(load_toml_runtime(toml_path))
        file_layer = dict(merged)
        env_layer = snapshot_from_process_env(environ)
        file_layer.update(env_layer)
        if cli_overrides:
            file_layer.update({k: v for k, v in cli_overrides.items() if v is not None})
        valid = {f.name for f in dataclasses.fields(cls)}
        cfg = cls(**{k: v for k, v in file_layer.items() if k in valid})
        cfg.validate()
        return cfg


# ---------------------------------------------------------------------------
# Process-wide runtime snapshot (ref: RuntimeConfigSnapshot runtime_config.rs:41)
# ---------------------------------------------------------------------------

_snapshot_lock = threading.Lock()
_installed_snapshot: Optional[EngineConfig] = None


def install_runtime_snapshot(cfg: EngineConfig) -> None:
    global _installed_snapshot
    with _snapshot_lock:
        _installed_snapshot = cfg


def runtime_snapshot() -> Optional[EngineConfig]:
    with _snapshot_lock:
        return _installed_snapshot
