"""InferenceEngine: the serving facade with continuous batching.

reference: src/transformer/inference_engine.{h,cc} — Init / AddQuery /
Infer / CommitInferenceResult.  TPU-native redesign of the step loop
(Infer_Gpu, inference_engine.cc:821-1124):

  - The reference builds one ragged mixed prefill/decode batch with
    per-query (start_row, prefix_len).  XLA wants static shapes, so the
    engine compiles TWO programs: a bucketed single-query `prefill_step`
    (prompt lengths padded to power-of-two buckets) and one batched
    `decode_step` over all proc slots (B = max_concurrent_queries, one
    token each).  Both share the slot-indexed KV cache; a prefill runs in
    a (1, S_bucket) temp cache and is scattered into its slot.
  - Sampling stays on host over one logits row per query
    (SampleTokens, inference_engine.cc:1986-2106) via
    sampling.DecodingStrategies.
  - Saturation (context budget exhausted) emits an implicit EOS
    (HandleSaturatedQueries, inference_engine.cc:1127).
"""

from __future__ import annotations

import dataclasses
import functools
import threading
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import decoder_forward_scan, decoder_forward, stack_layers
from ..models.spec import ModelSpec
from ..sampling.strategies import DecodingStrategies, SamplingOptions
from .kv_cache import KVCache
from .query_state import (DECODING, FINISHED, PREFILL, QueryState,
                          QueryStateTable)


@dataclasses.dataclass
class InferenceResult:
    """One step's outcome for one query
    (reference InferenceResult, inference_types.h)."""

    query_id: int
    next_tokens: List[int]
    is_end: bool
    finish_reason: str = ""


def _bucket(n: int, lo: int = 16, hi: int = 4096) -> int:
    """Smallest power-of-two >= n, clamped to [lo, hi].  The clamp matters
    when hi (max_context_len) is not a power of two: the prefill temp cache
    must never exceed the main cache's seq dim or _scatter_cache's
    dynamic_update_slice would be ill-formed."""
    b = lo
    while b < n and b < hi:
        b *= 2
    return min(b, hi)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_cache(cache: KVCache, tmp: KVCache, slot, length) -> KVCache:
    def put(big, small):
        return jax.lax.dynamic_update_slice(
            big, small.astype(big.dtype),
            (jnp.int32(0), slot) + (jnp.int32(0),) * (big.ndim - 2))

    k = put(cache.k, tmp.k)
    v = put(cache.v, tmp.v)
    ks = put(cache.k_scale, tmp.k_scale) if cache.quantized else None
    vs = put(cache.v_scale, tmp.v_scale) if cache.quantized else None
    new_len = cache.length.at[slot].set(length)
    return KVCache(k, v, ks, vs, new_len, head_dim=cache.head_dim)


class InferenceEngine:
    """Single-model serving engine over one jax device/mesh."""

    def __init__(self, spec: ModelSpec, params: dict,
                 max_concurrent_queries: int = 8,
                 max_context_len: int = 0,
                 tokenizer=None, vocab=None,
                 kv_cache_quantized: Optional[bool] = None,
                 use_pallas: bool = True,
                 cpu_layer_count: int = 0,
                 mesh=None,
                 sequence_parallel: int = 0,
                 pipeline_prefill: bool = False,
                 draft: Optional[tuple] = None,
                 draft_k: int = 4,
                 kv_cache_paging: bool = False,
                 kv_pool_tokens: int = 0):
        """mesh: optional jax.sharding.Mesh with ('dp','pp','tp') axes —
        the serving engine's multi-device path (reference
        Infer_TensorParallelism inference_engine.cc:1222-1296 +
        BuildDeviceNetwork_ByTensor/ByLayer network_builder.cc:1373-1406):
        weights are col/row-split over 'tp', the stacked layer axis over
        'pp', batch slots over 'dp'; XLA inserts the collectives the
        reference hand-rolled with its phase barrier."""
        self.spec = spec
        hp = spec.hyper_params
        self.params = params
        # sequence-parallel (ring attention) prefill: the prompt's seq axis
        # shards over an 'sp' mesh axis, weights replicate (SURVEY §5
        # long-context fresh design; config key `sequence_parallel`)
        self.sp_size = max(int(sequence_parallel), 0)
        if self.sp_size > 1:
            if mesh is not None:
                raise ValueError("sequence_parallel and device groups are "
                                 "mutually exclusive (one mesh per engine)")
            from ..parallel.mesh import make_sp_mesh
            mesh = make_sp_mesh(self.sp_size)
        self.mesh = mesh
        # micro-batch pipelined prefill over 'pp' (parallel/pipeline.py):
        # long prompts stream through the pipeline stage-by-stage instead
        # of running the layer scan serially across ranks.  Pure-'pp'
        # meshes only (v1).
        self.pipe_prefill = bool(pipeline_prefill)
        if self.pipe_prefill:
            if mesh is None:
                raise ValueError("pipeline_prefill needs a device group "
                                 "(ini `devices = 0;1;...`)")
            shape = dict(mesh.shape)
            if shape.get("pp", 1) < 2 or shape.get("dp", 1) != 1 \
                    or shape.get("tp", 1) != 1:
                raise ValueError("pipeline_prefill needs a pure-'pp' mesh "
                                 f"with pp >= 2 (got {shape})")
        self._pipe_progs: dict = {}
        if mesh is not None and (spec.host_kv_cache_percent > 0
                                 or cpu_layer_count > 0
                                 or spec.decoder_cpu_layer_count > 0):
            raise ValueError("host offload paths are single-device; "
                             "drop `devices` groups or the offload knobs")
        if isinstance(params.get("layers"), list):
            # fuse QKV / W1|W3 to cut kernel launches per layer
            from ..models.decoder import fuse_layer_weights, stack_moe_experts
            layers = params["layers"]
            had_separate = all("wq" in l.get("attn", {}) for l in layers)
            layers = fuse_layer_weights(layers)
            # E-leading expert stacking: enables routed (top-k-only) decode
            layers = stack_moe_experts(layers)
            if had_separate and all("qkv" in l["attn"] for l in layers):
                spec = dataclasses.replace(spec, qkv_format=1)
                self.spec = spec
            try:
                layers = stack_layers(layers)
            except ValueError:
                pass  # heterogeneous (e.g. MoE with a dense first layer):
                      # the layer loops accept plain lists
            self.params = dict(params, layers=layers)
        self.tokenizer = tokenizer
        self.vocab = vocab
        self.max_slots = max_concurrent_queries
        self.max_context_len = (max_context_len or spec.max_context_len)
        if self.max_context_len <= 0:
            self.max_context_len = hp.training_context_len
        if self.max_context_len <= 0:
            self.max_context_len = 2048
        # Pallas custom calls are not GSPMD-partitionable: under a
        # weight-sharding (dp/pp/tp) mesh, sharded weights/cache would be
        # ALL-GATHERED into every kernel call (catastrophic traffic,
        # likely OOM).  Those engines run the XLA path — GSPMD partitions
        # its dequant/attention natively; shard_map-wrapped kernels are
        # the round-4 path to pallas+mesh.  Ring ('sp') meshes replicate
        # the weights (only the prompt's sequence axis shards), so their
        # kernels stay on replicated operands and remain safe.
        self.use_pallas = use_pallas and (mesh is None or self.sp_size > 1)

        if kv_cache_quantized is None:
            from ..quant.formats import is_quantized
            kv_cache_quantized = is_quantized(spec.device_kv_cache_data_type)

        # host-RAM embedding table (reference be_host_embeddings +
        # GetEmbdTensor, inference_engine.cc:1298-1353): keep the gather on
        # host, upload only the (B, T, E) rows per step.  Requires an
        # untied lm_head (tied heads still need the table in HBM).
        self.host_embeddings: Optional[np.ndarray] = None
        if (spec.be_host_embeddings and mesh is None
                and "lm_head" in self.params
                and "dec_embeddings" in self.params):
            self.host_embeddings = np.asarray(
                self.params["dec_embeddings"], dtype=np.float32)
            self.params = {k: v for k, v in self.params.items()
                           if k != "dec_embeddings"}
        self.table = QueryStateTable(self.max_slots)

        # host-RAM KV offload: leading layers keep K/V in host numpy
        # (reference host_kv_cache_percent, kv_cache.cc:278-319).
        # CPU-layer offload (decoder_cpu_layer_count): same layer split,
        # but weights AND compute for the prefix live on the jax CPU
        # backend — the analog of the reference's ggml CpuInferenceWorker
        # (cpu_inference_worker.h:13); activations cross host<->device at
        # the split point (inference_engine.cc:860-886).
        from .host_offload import (HostKVStore, host_layer_split,
                                   make_host_layer_fn)
        self.cpu_layer_count = max(cpu_layer_count,
                                   max(spec.decoder_cpu_layer_count, 0))
        self.cpu_device = None
        self.host_kv_layers = max(host_layer_split(spec, hp.decoder_layers),
                                  self.cpu_layer_count)
        self.n_device_layers = hp.decoder_layers - self.host_kv_layers
        self.host_kv: Optional["HostKVStore"] = None
        self.host_layer_params: list = []
        if self.host_kv_layers:
            from ..models.decoder import split_layers
            prefix, suffix = split_layers(self.params["layers"],
                                          self.host_kv_layers)
            if self.cpu_layer_count:
                try:
                    self.cpu_device = jax.devices("cpu")[0]
                except RuntimeError:
                    self.cpu_device = None
                if self.cpu_device is not None:
                    prefix = jax.device_put(prefix, self.cpu_device)
            self.host_layer_params = prefix
            self.params = dict(self.params, layers=suffix)
            self.host_kv = HostKVStore.create(
                self.host_kv_layers, self.max_slots, self.max_context_len,
                hp.kv_heads, hp.head_dim)
            self._host_layer_step = jax.jit(
                make_host_layer_fn(spec, use_pallas and
                                   self.cpu_device is None))
        # paged KV cache (runtime/paged_kv.py): page pool + per-slot page
        # tables — HBM scales with tokens in flight, not slots x
        # max_context.  Pages covering prompt + max_new are reserved at
        # prefill; queries defer (stay PREFILL-pending) when the pool is
        # exhausted and admit as finishing queries release pages.
        self._paging = bool(kv_cache_paging)
        self._free_pages: list = []
        self._slot_pages: Dict[int, list] = {}
        if self._paging:
            if (mesh is not None or self.sp_size > 1
                    or self.host_kv_layers or draft is not None):
                raise ValueError("kv_cache_paging composes with the plain "
                                 "single-device engine (no device groups, "
                                 "ring prefill, host offload or draft)")
            from .paged_kv import PagedKVCache
            self.cache = PagedKVCache.create(
                max(self.n_device_layers, 1), self.max_slots,
                self.max_context_len, hp.kv_heads, hp.head_dim,
                pool_tokens=kv_pool_tokens,
                quantized=kv_cache_quantized)
            # page 0 stays unallocated: unassigned table entries read it
            self._free_pages = list(range(1, self.cache.num_pages))
        else:
            self.cache = KVCache.create(
                max(self.n_device_layers, 1), self.max_slots,
                self.max_context_len, hp.kv_heads, hp.head_dim,
                quantized=kv_cache_quantized)
        self.tp_shardmap = False
        if mesh is not None:
            from ..parallel.sharding import shard_params, shard_kv_cache
            sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
            if self.max_slots % sizes.get("dp", 1):
                raise ValueError("max_concurrent_queries must be a multiple"
                                 f" of dp={sizes.get('dp')}")
            if hp.decoder_layers % sizes.get("pp", 1):
                raise ValueError(f"layers ({hp.decoder_layers}) must divide"
                                 f" by pp={sizes.get('pp')}")
            if hp.kv_heads % sizes.get("tp", 1):
                raise ValueError(f"kv heads ({hp.kv_heads}) must divide by"
                                 f" tp={sizes.get('tp')}")
            # shard_map decode (parallel/tp_step.py): the per-layer Pallas
            # kernels run on every TP shard — the reference's quantized
            # GEMV per shard + all-reduce (inference_worker.cc:1381-1391).
            # GSPMD keeps handling prefill and any ineligible config.
            from ..parallel.tp_step import tp_eligible, prepare_tp_params
            tp = sizes.get("tp", 1)
            if (use_pallas and self.sp_size <= 1
                    and sizes.get("pp", 1) == 1 and tp > 1
                    and tp_eligible(self.spec, self.params.get("layers"),
                                    tp)):
                self.params = dict(
                    self.params,
                    layers=prepare_tp_params(self.params["layers"],
                                             self.spec, tp))
                spec = dataclasses.replace(self.spec, qkv_format=0,
                                           w1n3_ranks=tp)
                self.spec = spec
                self.tp_shardmap = True
            self.params = shard_params(self.params, mesh, stacked=True)
            self.cache = shard_kv_cache(self.cache, mesh)
        self._lengths = np.zeros((self.max_slots,), np.int32)
        # host->device KV upload accounting (bounded-transfer invariant)
        self.host_kv_bytes_uploaded = 0
        eos_ids = set()
        if vocab is not None and getattr(vocab, "eos_id", -1) >= 0:
            eos_ids.add(vocab.eos_id)
        self.strategies = DecodingStrategies(eos_ids=eos_ids)
        self.eos_ids = eos_ids
        self._lock = threading.Lock()
        self.perf_stat: Dict[str, float] = {}
        from ..utils.study import StudyMode, PerfStat
        self.study = StudyMode(enabled=False)
        self.perf = PerfStat(enabled=False)

        from ..utils.logging_util import log_memory_stat
        log_memory_stat(self.params, self.cache)

        # chunked prefill: prompts longer than one chunk are processed
        # `prefill_chunk` tokens per engine step against the MAIN cache
        # (no temp-cache scatter), so decode latency per step stays
        # bounded while a long prompt prefills (reference: the
        # max_token_num=256 mixed-batch budget, inference_engine.cc:1054)
        self.prefill_chunk = 256
        # speculative decoding (runtime/spec_decode.py): a draft model
        # proposes k tokens/slot, one (B, k+1) target forward verifies
        self.draft = None
        self.spec_stats = {"proposed": 0, "accepted": 0, "rounds": 0}
        if draft is not None:
            if self.host_kv_layers or mesh is not None:
                raise ValueError("speculative decoding composes with the "
                                 "single-device engine (no host offload "
                                 "or device groups)")
            from .spec_decode import DraftWorker
            self.draft = DraftWorker(draft[0], draft[1], self.max_slots,
                                     self.max_context_len, use_pallas,
                                     k=draft_k)
        self._verify_step = jax.jit(self._verify_impl, donate_argnums=(3,))
        self._decode_step = jax.jit(self._decode_impl, donate_argnums=(3,))
        self._chunk_step = jax.jit(self._chunk_impl, donate_argnums=(2,),
                                   static_argnames=("need_logits",))
        self._prefill_step = jax.jit(self._prefill_impl,
                                     static_argnames=("bucket",))
        self._embed_step = jax.jit(self._embed_impl)
        self._suffix_decode = jax.jit(self._suffix_impl, donate_argnums=(2,))
        self._suffix_prefill = jax.jit(self._suffix_prefill_impl,
                                       static_argnames=("bucket",))
        self._mega_probed = False

    def _probe_fused_decode(self) -> None:
        """First-decode compile probe (VERDICT r3 weak-3): run one decode
        step on a COPY of the cache before the real one.  If the
        whole-model fused kernel (kernels/decode_step.py) fails to build
        on this chip, disable it process-wide, re-jit the decode programs
        and serve via the per-layer path instead of crashing.  The probe
        is the first step's compile, so the success path costs one extra
        step of compute, not an extra compile."""
        self._mega_probed = True
        from ..kernels import decode_step as _mega
        if not (self.use_pallas and _mega.mega_backend_ok()
                and _mega.mega_disabled() is None):
            return
        stacked = self.params.get("layers")
        bsz = self.max_slots
        if not _mega.fused_step_preferred(self.spec, stacked, self.cache,
                                          bsz):
            return
        tokens = np.zeros((bsz, 1), np.int32)
        active = np.zeros((bsz,), np.int32)
        cache_copy = jax.tree_util.tree_map(jnp.copy, self.cache)
        try:
            if self.host_kv_layers:
                hp = self.spec.hyper_params
                x = jnp.zeros((bsz, 1, hp.embd_dims), jnp.bfloat16)
                out = self._suffix_decode(self.params, x, cache_copy,
                                          jnp.asarray(active))
            else:
                out = self._decode_step(
                    self.params, self._place_batch(tokens),
                    self._gather_embeds(tokens), cache_copy,
                    self._place_batch(active))
            jax.block_until_ready(out)
        except Exception as e:  # noqa: BLE001 — compile OR runtime build
            import logging
            head = " | ".join(str(e).splitlines()[:2])[:300]
            logging.getLogger(__name__).warning(
                "fused decode step failed to build (%s: %s); serving "
                "falls back to the per-layer path", type(e).__name__, head)
            _mega.disable_mega(type(e).__name__)
            # fresh jit wrappers -> fresh traces without the mega call
            self._decode_step = jax.jit(self._decode_impl,
                                        donate_argnums=(3,))
            self._verify_step = jax.jit(self._verify_impl,
                                        donate_argnums=(3,))
            self._suffix_decode = jax.jit(self._suffix_impl,
                                          donate_argnums=(2,))

    def _gather_embeds(self, tokens: np.ndarray):
        """Host-RAM embedding gather (None when embeddings live in HBM)."""
        if self.host_embeddings is None:
            return None
        return jnp.asarray(self.host_embeddings[tokens], jnp.bfloat16)

    def _place_batch(self, arr):
        """Slot-batched input: shard the leading (slot) axis over 'dp'."""
        if self.mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P
        pspec = P("dp", *([None] * (np.asarray(arr).ndim - 1)))
        return jax.device_put(np.asarray(arr),
                              NamedSharding(self.mesh, pspec))

    def _place_rep(self, arr):
        """Per-query input (prefill): replicated over the mesh."""
        if self.mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P
        a = np.asarray(arr)
        return jax.device_put(a, NamedSharding(self.mesh,
                                               P(*([None] * a.ndim))))

    # -- jitted programs (host-KV-offload pieces) -------------------------
    def _embed_impl(self, params, tokens, embeds, positions):
        from ..models.decoder import embed_tokens
        return embed_tokens(self.spec, params, tokens, positions, embeds)

    def _suffix_impl(self, params, x, cache, active):
        """Run the on-device layer suffix + logits for one decode step."""
        from ..models.decoder import decoder_layers_unrolled, output_logits
        if self.n_device_layers > 0:
            positions = cache.length[:, None]
            x, cache = decoder_layers_unrolled(
                self.spec, params["layers"], x, positions, cache,
                use_pallas=self.use_pallas)
        logits = output_logits(self.spec, params, x,
                               use_pallas=self.use_pallas)
        cache = cache.with_length(cache.length + active)
        return logits[:, -1, :], cache

    def _suffix_prefill_impl(self, params, x, length, *, bucket: int):
        from ..models.decoder import decoder_layers_scan, output_logits
        hp = self.spec.hyper_params
        tmp = KVCache.create(max(self.n_device_layers, 1), 1, bucket,
                             hp.kv_heads, hp.head_dim,
                             quantized=self.cache.quantized)
        if self.n_device_layers > 0:
            positions = jnp.arange(bucket, dtype=jnp.int32)[None, :]
            x, tmp = decoder_layers_scan(self.spec, params["layers"],
                                         x, positions, tmp,
                                         use_pallas=self.use_pallas)
        logits = output_logits(self.spec, params, x,
                               use_pallas=self.use_pallas)
        return logits[0, length - 1, :], tmp

    def _chunk_impl(self, params, tokens, cache, embeds, slot, start,
                    *, need_logits: bool):
        """One prefill chunk for one slot against the main cache.
        tokens (1, C); slot/start scalars.  Intermediate chunks skip the
        lm_head entirely (need_logits=False)."""
        from ..models.decoder import (decoder_layers_chunk, embed_tokens,
                                      output_logits)
        c = tokens.shape[1]
        positions = start + jnp.arange(c, dtype=jnp.int32)[None, :]
        x = embed_tokens(self.spec, params, tokens, positions, embeds)
        x, cache = decoder_layers_chunk(
            self.spec, params["layers"], x, positions, cache,
            slot, start, use_pallas=self.use_pallas)
        if not need_logits:
            return jnp.zeros((c, 1), jnp.float32), cache
        logits = output_logits(self.spec, params, x,
                               use_pallas=self.use_pallas)
        return logits[0], cache

    def _verify_impl(self, params, tokens, embeds, cache, advance):
        """Speculative verify: tokens (B, T=k+1) at per-slot positions
        cache.length + arange(T); returns logits (B, T, V).  Lengths are
        committed on the host after acceptance (spec_decode.py)."""
        from ..models.decoder import (decoder_layers_unrolled, embed_tokens,
                                      output_logits)
        positions = cache.length[:, None] + jnp.arange(
            tokens.shape[1], dtype=jnp.int32)[None, :]
        x = embed_tokens(self.spec, params, tokens, positions, embeds)
        x, cache = decoder_layers_unrolled(
            self.spec, params["layers"], x, positions, cache,
            use_pallas=self.use_pallas)
        logits = output_logits(self.spec, params, x,
                               use_pallas=self.use_pallas)
        cache = cache.with_length(cache.length + advance)
        return logits, cache

    # -- jitted programs -------------------------------------------------
    def _decode_impl(self, params, tokens, embeds, cache, active):
        """tokens (B,1) int32; active (B,) int32 mask.

        The decode layer loop is statically UNROLLED: static layer indices
        fuse the KV-cache reads/writes, where lax.scan would dynamic-slice
        and restack each layer's cache every iteration (~25% of step
        time).  Prefill keeps scan (compile speed; amortized per token)."""
        from ..models.decoder import (decoder_layers_unrolled, embed_tokens,
                                      output_logits)
        positions = cache.length[:, None]
        x = embed_tokens(self.spec, params, tokens, positions, embeds)
        if self.tp_shardmap:
            from ..parallel.tp_step import tp_decode_layers
            x, cache = tp_decode_layers(self.spec, params["layers"], x,
                                        cache, self.mesh, use_pallas=True)
        else:
            x, cache = decoder_layers_unrolled(
                self.spec, params["layers"], x, positions, cache,
                use_pallas=self.use_pallas)
        logits = output_logits(self.spec, params, x,
                               use_pallas=self.use_pallas)
        cache = cache.with_length(cache.length + active)
        return logits[:, -1, :], cache

    def _prefill_impl(self, params, tokens, embeds, length, *, bucket: int):
        """tokens (1, bucket) int32, length scalar; returns last-token
        logits and the temp KV cache to scatter into the slot."""
        hp = self.spec.hyper_params
        tmp = KVCache.create(hp.decoder_layers, 1, bucket, hp.kv_heads,
                             hp.head_dim, quantized=self.cache.quantized)
        positions = jnp.arange(bucket, dtype=jnp.int32)[None, :]
        ring = None
        if self.sp_size > 1 and bucket % self.sp_size == 0:
            ring = {"mesh": self.mesh, "axis": "sp",
                    "kv_len": jnp.reshape(length, (1,))}
        logits, tmp = decoder_forward_scan(
            self.spec, params, tokens, positions, tmp,
            use_pallas=self.use_pallas, input_embeds=embeds, ring=ring)
        last = logits[0, length - 1, :]
        return last, tmp

    def _pipeline_impl(self, params, tokens, length, *, t_pad: int):
        """Whole-prompt pipelined prefill (parallel/pipeline.py): tokens
        (1, t_pad) padded to a chunk multiple; returns last-token logits
        and the pipeline temp cache ((n_chunks+1)*chunk rows — the tail
        chunk is the pipeline's bubble-write slot, masked by length)."""
        from ..models.decoder import embed_tokens, output_logits
        from ..parallel.pipeline import (pipelined_chunk_prefill,
                                         pipeline_min_context)
        hp = self.spec.hyper_params
        c = self.prefill_chunk
        pos = jnp.arange(t_pad, dtype=jnp.int32)[None, :]
        emb = embed_tokens(self.spec, params, tokens, pos)
        tmp = KVCache.create(hp.decoder_layers, 1,
                             pipeline_min_context(t_pad, c), hp.kv_heads,
                             hp.head_dim, quantized=self.cache.quantized)
        hidden, tmp = pipelined_chunk_prefill(
            self.spec, params["layers"], emb, tmp, t_pad, c, self.mesh,
            use_pallas=self.use_pallas)
        last = jax.lax.dynamic_slice(
            hidden, (0, length - 1, 0), (1, 1, hidden.shape[-1]))
        logits = output_logits(self.spec, params, last,
                               use_pallas=self.use_pallas)
        return logits[0, -1, :], tmp

    def _prefill_pipelined(self, padded: np.ndarray, length: int):
        t_pad = padded.shape[1]
        if t_pad not in self._pipe_progs:
            self._pipe_progs[t_pad] = jax.jit(functools.partial(
                self._pipeline_impl, t_pad=t_pad))
        return self._pipe_progs[t_pad](self.params, self._place_rep(padded),
                                       jnp.int32(length))

    def _finish_prefill(self, qs, row: np.ndarray, results: list,
                        tokens) -> None:
        """Shared epilogue of every prefill path: record logits, choose
        the first token, flip the query to DECODING, seed the draft."""
        from ..utils.study import TAG_LOGITS
        self.study.dump(TAG_LOGITS, row, name=f"prefill q{qs.query_id}")
        tok = self.strategies.choose_token(qs.query_id, row,
                                           qs.prompt_tokens)
        results.append(self._make_result(qs, tok))
        qs.phase = DECODING
        if self.draft is not None:
            self.draft.prefill(qs.slot, tokens)

    def _scatter_prefill(self, slot: int, tmp: KVCache, length: int):
        """Copy a (1, bucket) temp cache into the main cache slot
        (donated: no full-cache copy per prefill)."""
        self.cache = _scatter_cache(self.cache, tmp, jnp.int32(slot),
                                    jnp.int32(length))

    # -- paged-pool bookkeeping (kv_cache_paging) ------------------------
    def _reserve_pages(self, qs) -> bool:
        """Reserve pages covering prompt + max_new for a pending query;
        False = pool exhausted, keep it PREFILL-pending (the reservation
        up front means decode never stalls mid-stream)."""
        if qs.slot in self._slot_pages:
            return True  # reserved on an earlier (deferred) attempt
        pt = self.cache.page_tokens
        want = min(len(qs.prompt_tokens) + qs.max_new_tokens + 1,
                   self.max_context_len)
        need = min(-(-want // pt), self.cache.max_pages_per_slot)
        if need > self.cache.num_pages - 1:
            raise RuntimeError(
                f"query needs {need} pages but the pool only has "
                f"{self.cache.num_pages - 1}; raise kv_pool_tokens")
        if need > len(self._free_pages):
            return False
        pids = [self._free_pages.pop() for _ in range(need)]
        self._slot_pages[qs.slot] = pids
        self.cache = self.cache.with_page_row(
            qs.slot, np.asarray(pids, np.int32))
        return True

    def _release_pages(self, slot: int) -> None:
        pids = self._slot_pages.pop(slot, None)
        if pids:
            self._free_pages.extend(pids)

    # -- public API (reference: inference_engine.h facade) --------------
    def add_query(self, prompt: Sequence[int] | str,
                  sampling: Optional[SamplingOptions] = None,
                  max_new_tokens: int = 256) -> int:
        """Tokenize + admission control. Returns query_id, or -1 when at
        max_concurrent_queries, -2 on empty/oversized input."""
        if isinstance(prompt, str):
            if self.tokenizer is None:
                raise ValueError("string query but no tokenizer configured")
            tokens = self.tokenizer.tokenize(prompt, add_bos=True)
        else:
            tokens = list(prompt)
        if not tokens or len(tokens) >= self.max_context_len:
            return -2
        with self._lock:
            qid = self.table.add(tokens, sampling, max_new_tokens)
        if qid > 0:
            self.strategies.begin_query(qid, sampling or SamplingOptions())
        return qid

    def infer(self) -> List[InferenceResult]:
        """One engine step: at most one prefill + one batched decode step
        over all decoding slots (reference Infer, inference_engine.cc:821)."""
        t0 = time.time()
        results: List[InferenceResult] = []

        with self._lock:
            pending = self.table.prefill_pending()
        if pending and self._paging and not self._reserve_pages(pending[0]):
            pending = []  # pool exhausted; retry when queries release pages
        if pending:
            qs = pending[0]
            tokens = qs.prompt_tokens
            use_pipeline = (self.pipe_prefill
                            and len(tokens) > self.prefill_chunk
                            and not self._paging
                            and not self.host_kv_layers
                            # heterogeneous (list) stacks can't shard
                            # the layer axis; fall back to chunking
                            and isinstance(self.params.get("layers"),
                                           dict))
            if use_pipeline:
                c = self.prefill_chunk
                n_chunks = _bucket(-(-len(tokens) // c), lo=1,
                                   hi=max(self.max_context_len // c, 1))
                if (n_chunks + 1) * c > self.max_context_len:
                    use_pipeline = False  # no room for the bubble slot in
                    # the scatter target; fall back to serial chunking
            use_chunked = (len(tokens) > self.prefill_chunk
                           and not use_pipeline
                           and not self._paging  # paged: whole-bucket
                           # prefill into a dense temp, then page scatter
                           and not self.host_kv_layers
                           and self.sp_size <= 1)  # ring mode prefills
                           # the whole prompt sharded over 'sp' instead
            from ..utils.study import TAG_LOGITS, perf_key
            if use_pipeline:
                t_pad = n_chunks * self.prefill_chunk
                padded = np.zeros((1, t_pad), np.int32)
                padded[0, :len(tokens)] = tokens
                last_logits, tmp = self._prefill_pipelined(
                    padded, len(tokens))
                self._scatter_prefill(qs.slot, tmp, len(tokens))
                self._lengths[qs.slot] = len(tokens)
                self._finish_prefill(qs, np.asarray(last_logits, np.float32),
                                     results, tokens)
            elif use_chunked:
                c = self.prefill_chunk
                start = qs.prefill_pos
                if start == 0:
                    self.cache = self.cache.with_length(
                        self.cache.length.at[qs.slot].set(
                            self.max_context_len - 1))
                n = min(c, len(tokens) - start)
                chunk = np.zeros((1, c), np.int32)
                chunk[0, :n] = tokens[start:start + n]
                done = start + n >= len(tokens)
                logits, self.cache = self._chunk_step(
                    self.params, self._place_rep(chunk), self.cache,
                    self._gather_embeds(chunk), jnp.int32(qs.slot),
                    jnp.int32(start), need_logits=done)
                qs.prefill_pos = start + n
                if done:
                    self.cache = self.cache.with_length(
                        self.cache.length.at[qs.slot].set(len(tokens)))
                    self._lengths[qs.slot] = len(tokens)
                    self._finish_prefill(
                        qs, np.asarray(logits, np.float32)[n - 1],
                        results, tokens)
            else:
                bucket = _bucket(len(tokens), hi=self.max_context_len)
                padded = np.zeros((1, bucket), np.int32)
                padded[0, :len(tokens)] = tokens
                if self.host_kv_layers:
                    last_logits, tmp = self._prefill_offloaded(
                        qs.slot, padded, len(tokens), bucket)
                else:
                    last_logits, tmp = self._prefill_step(
                        self.params, self._place_rep(padded),
                        self._gather_embeds(padded),
                        jnp.int32(len(tokens)), bucket=bucket)
                if self._paging:
                    from .paged_kv import scatter_prefill_pages
                    pids = self._slot_pages[qs.slot]
                    n_copy = min(-(-len(tokens) // self.cache.page_tokens),
                                 len(pids))
                    self.cache = scatter_prefill_pages(
                        self.cache, tmp,
                        jnp.asarray(pids[:n_copy], jnp.int32),
                        jnp.int32(len(tokens)), slot=qs.slot,
                        n_pages=n_copy)
                else:
                    self._scatter_prefill(qs.slot, tmp, len(tokens))
                self._lengths[qs.slot] = len(tokens)
                self._finish_prefill(qs, np.asarray(last_logits, np.float32),
                                     results, tokens)
            self.perf_stat["prefill_ms"] = (time.time() - t0) * 1e3
            self.perf.add(perf_key(-1, 1), self.perf_stat["prefill_ms"])

        with self._lock:
            # a query prefilled this step already produced its token
            decoding = [q for q in self.table.decoding()
                        if not any(r.query_id == q.query_id
                                   for r in results)]
        if decoding and not self._mega_probed:
            self._probe_fused_decode()
        spec_ok = decoding and self.draft is not None and all(
            (q.sampling.strategy or "greedy") in ("greedy", "")
            for q in decoding)
        if spec_ok:
            with self._lock:
                # a slot mid-chunked-prefill is parked at max_context-1;
                # k+1-row verify writes would clamp-shift into history
                spec_ok = not self.table.prefill_pending()
            k1 = self.draft.k + 1
            spec_ok = spec_ok and all(
                len(q.prompt_tokens) + len(q.generated) + k1
                <= self.max_context_len for q in decoding)
        if spec_ok:
            # speculative round: 1..k+1 tokens per slot, greedy-identical
            t1 = time.time()
            from .spec_decode import speculative_round
            from ..utils.study import perf_key
            results.extend(speculative_round(self, decoding))
            self.perf_stat["decode_ms"] = (time.time() - t1) * 1e3
            self.perf.add(perf_key(-1, 2), self.perf_stat["decode_ms"])
        elif decoding:
            t1 = time.time()
            tokens = np.zeros((self.max_slots, 1), np.int32)
            active = np.zeros((self.max_slots,), np.int32)
            by_slot: Dict[int, QueryState] = {}
            for qs in decoding:
                last = (qs.generated[-1] if qs.generated
                        else qs.prompt_tokens[-1])
                tokens[qs.slot, 0] = last
                active[qs.slot] = 1
                by_slot[qs.slot] = qs
            if self.host_kv_layers:
                logits = self._decode_offloaded(tokens, active)
            else:
                logits, self.cache = self._decode_step(
                    self.params, self._place_batch(tokens),
                    self._gather_embeds(tokens),
                    self.cache, self._place_batch(active))
            self._lengths += active
            rows = np.asarray(logits, np.float32)
            from ..utils.study import TAG_LOGITS, perf_key
            for slot, qs in by_slot.items():
                self.study.dump(TAG_LOGITS, rows[slot],
                                name=f"decode q{qs.query_id}")
                tok = self.strategies.choose_token(
                    qs.query_id, rows[slot],
                    qs.prompt_tokens + qs.generated)
                results.append(self._make_result(qs, tok))
            self.perf_stat["decode_ms"] = (time.time() - t1) * 1e3
            self.perf.add(perf_key(-1, 2), self.perf_stat["decode_ms"])
        return results

    @classmethod
    def from_config(cls, config, model_index: int = 0) -> "InferenceEngine":
        """Build a fully-loaded engine from an EngineConfig
        (the Init facade, inference_engine.cc:43-229)."""
        from ..loaders.model_loader import load_model
        from ..tokenizer.loading import load_tokenizer
        from ..utils.study import StudyMode, PerfStat

        spec = config.models[model_index]
        params = load_model(spec)
        tok = load_tokenizer(spec)
        from ..parallel.mesh import mesh_from_groups
        mesh = mesh_from_groups(config.device_groups)
        eng = cls(spec, params,
                  max_concurrent_queries=config.max_concurrent_queries,
                  max_context_len=spec.max_context_len,
                  tokenizer=tok, vocab=tok.vocab if tok else None,
                  cpu_layer_count=max(config.decoder_cpu_layer_count, 0),
                  mesh=mesh,
                  sequence_parallel=config.sequence_parallel,
                  pipeline_prefill=config.pipeline_prefill,
                  kv_cache_paging=config.kv_cache_paging,
                  kv_pool_tokens=config.kv_pool_tokens)
        eng.study = StudyMode(enabled=config.is_study_mode,
                              show_tensors=config.show_tensors)
        eng.perf = PerfStat(enabled=config.enable_perf_stat)
        if config.max_batch_tokens > 0:
            # the reference's max_token_num prefill budget per step
            eng.prefill_chunk = config.max_batch_tokens
        return eng

    # -- host-KV-offload step drivers -------------------------------------
    def _prefill_offloaded(self, slot: int, padded: np.ndarray, length: int,
                           bucket: int):
        """Prefill with the leading layers' KV kept in host RAM."""
        hp = self.spec.hyper_params
        pos = jnp.arange(bucket, dtype=jnp.int32)[None, :]
        x = self._embed_step(self.params, jnp.asarray(padded),
                             self._gather_embeds(padded), pos)
        if self.cpu_device is not None:
            x = jax.device_put(x, self.cpu_device)
            pos = jax.device_put(pos, self.cpu_device)
        k_ctx = jnp.zeros((1, bucket, hp.kv_heads, hp.head_dim),
                          jnp.bfloat16)
        v_ctx = k_ctx
        start = jnp.zeros((1,), jnp.int32)
        if self.cpu_device is not None:
            k_ctx = jax.device_put(k_ctx, self.cpu_device)
            v_ctx = k_ctx
            start = jax.device_put(start, self.cpu_device)
        for i, lp in enumerate(self.host_layer_params):
            x, k_new, v_new = self._host_layer_step(lp, x, k_ctx, v_ctx,
                                                    pos, start)
            self.host_kv.k[i, slot, :length] = np.asarray(
                k_new, np.float16)[0, :length]
            self.host_kv.v[i, slot, :length] = np.asarray(
                v_new, np.float16)[0, :length]
        if self.cpu_device is not None:
            x = jax.device_put(x, jax.devices()[0])
        return self._suffix_prefill(self.params, x, jnp.int32(length),
                                    bucket=bucket)

    def _decode_offloaded(self, tokens: np.ndarray, active: np.ndarray):
        """One decode step with host-KV leading layers.

        Only rows [0, bucket) of the host cache are uploaded, where bucket
        is the smallest power-of-two covering the longest live context —
        transfer per token is O(longest context), not O(max_context_len)
        (the reference's CpuLayerKVCache streams only valid rows,
        kv_cache.cc:15-91; VERDICT r2 weak-6).  Bucketing keeps
        _host_layer_step's jit cache to log2 shapes."""
        starts = jnp.asarray(self._lengths)
        pos = starts[:, None]
        x = self._embed_step(self.params, jnp.asarray(tokens),
                             self._gather_embeds(tokens), pos)
        live = int(self._lengths.max()) + 1 if self._lengths.size else 1
        bucket = 64
        while bucket < live:
            bucket *= 2
        bucket = min(bucket, self.max_context_len)
        if self.cpu_device is not None:
            x = jax.device_put(x, self.cpu_device)
            pos = jax.device_put(pos, self.cpu_device)
            starts = jax.device_put(starts, self.cpu_device)
        for i, lp in enumerate(self.host_layer_params):
            dev = self.cpu_device
            k_ctx = jnp.asarray(self.host_kv.k[i][:, :bucket])
            v_ctx = jnp.asarray(self.host_kv.v[i][:, :bucket])
            self.host_kv_bytes_uploaded += k_ctx.nbytes + v_ctx.nbytes
            if dev is not None:
                k_ctx = jax.device_put(k_ctx, dev)
                v_ctx = jax.device_put(v_ctx, dev)
            k_ctx = k_ctx.astype(jnp.bfloat16)
            v_ctx = v_ctx.astype(jnp.bfloat16)
            x, k_new, v_new = self._host_layer_step(lp, x, k_ctx, v_ctx,
                                                    pos, starts)
            self.host_kv.append(i, np.asarray(k_new, np.float16),
                                np.asarray(v_new, np.float16),
                                self._lengths, active)
        if self.cpu_device is not None:
            x = jax.device_put(x, jax.devices()[0])
        logits, self.cache = self._suffix_decode(self.params, x, self.cache,
                                                 jnp.asarray(active))
        return logits

    def _make_result(self, qs: QueryState, tok: int) -> InferenceResult:
        is_eos = tok in self.eos_ids
        saturated = (qs.context_len + 1 >= self.max_context_len
                     or len(qs.generated) + 1 >= qs.max_new_tokens)
        reason = "eos" if is_eos else ("length" if saturated else "")
        return InferenceResult(qs.query_id, [tok], is_eos or saturated,
                               reason)

    def commit_inference_result(self, results: List[InferenceResult]) -> None:
        """Append accepted tokens / finish queries
        (reference CommitInferenceResult, inference_engine.cc:1357-1385)."""
        with self._lock:
            for r in results:
                qs = self.table.get(r.query_id)
                if qs is None or qs.phase == FINISHED:
                    continue
                for t in r.next_tokens:
                    if t not in self.eos_ids:
                        qs.generated.append(t)
                if r.is_end:
                    if self._paging:
                        self._release_pages(qs.slot)
                    self.table.finish(r.query_id, r.finish_reason)
                    self.strategies.end_query(r.query_id)

    def warmup(self, buckets=None) -> None:
        """Pre-compile the prefill programs for the given bucket sizes so
        the first real prompt doesn't pay compile latency (prefill shapes
        are padded to power-of-two buckets)."""
        if self.host_kv_layers:
            return  # offloaded prefill compiles per-piece lazily
        for b in buckets or (16, 64, 256):
            b = min(b, _bucket(self.max_context_len, hi=self.max_context_len))
            if b > self.max_context_len or b > self.prefill_chunk:
                continue
            tokens = jnp.zeros((1, b), jnp.int32)
            self._prefill_step(self.params, tokens,
                               self._gather_embeds(np.zeros((1, b),
                                                            np.int32)),
                               jnp.int32(1), bucket=b)
        if self.max_context_len > self.prefill_chunk and not self._paging:
            # chunked-prefill programs (one shape, two variants)
            chunk = np.zeros((1, self.prefill_chunk), np.int32)
            for need_logits in (False, True):
                _, self.cache = self._chunk_step(
                    self.params, self._place_rep(chunk), self.cache,
                    self._gather_embeds(chunk), jnp.int32(0),
                    jnp.int32(0), need_logits=need_logits)
            # scrub slot 0 (warmup wrote garbage rows at position 0; real
            # prefills overwrite, and length stays 0)
            self.cache = self.cache.with_length(
                self.cache.length.at[0].set(0))

    def has_work(self) -> bool:
        with self._lock:
            return bool(self.table.active)

    def query_tokens(self, qid: int) -> List[int]:
        qs = self.table.get(qid)
        return list(qs.generated) if qs else []

    def generate(self, prompt: Sequence[int] | str,
                 sampling: Optional[SamplingOptions] = None,
                 max_new_tokens: int = 64) -> List[int]:
        """Convenience one-query loop (the llm_inference CLI path)."""
        qid = self.add_query(prompt, sampling, max_new_tokens)
        if qid < 0:
            raise RuntimeError(f"add_query failed: {qid}")
        while True:
            results = self.infer()
            self.commit_inference_result(results)
            qs = self.table.get(qid)
            if qs is None or qs.phase == FINISHED:
                break
        return self.query_tokens(qid)
