"""Language-model feature extraction, TPU-native.

Reference behavior (encoding/features/language_model.py:9-222): a
TransformerLens model is run ONE TEXT AT A TIME in a Python loop
(language_model.py:103-118), recomputing the full prefix for every word, with
`blocks.{i}.hook_resid_pre` captures and last-token/mean pooling.

TPU redesign:
- texts are tokenized up front, bucketed by padded length, and run through the
  model in BATCHES under one jitted forward per (batch, length) bucket —
  hundreds of context windows per MXU pass instead of one;
- all hidden states are captured in that single forward
  (`output_hidden_states=True`); layer parity with TransformerLens:
  resid_pre of block i == hidden_states[i] (embeddings are hidden_states[0]),
  resid_post of block i == hidden_states[i+1];
- pooling (last real token via the attention mask, or masked mean) happens
  on device inside the same jitted program;
- empty strings produce zero vectors for every layer
  (language_model.py:133-136, 170-175);
- prefix sharing: context windows that are token-prefixes of one another
  (fullcontext growth before the lookback budget truncates; every
  nocontext/halfcontext segment) are served from ONE causal forward over the
  chain-final sequence — position t's hidden state equals the standalone
  prefix forward, and masked-mean pooling equals the cumulative mean. Exact
  for decoder-only models (auto-enabled via _CAUSAL_MODEL_TYPES; `prefix_
  sharing` config key overrides). Turns the reference's O(n_words^2) token
  work into O(n_tokens) on those spans;
- pipelined dispatch: up to `pipeline_depth` forwards stay in flight before
  the host blocks on a fetch, overlapping tokenize/pad/D2H with device
  compute (the tunneled-TPU wall is round-trip latency, not the MXU —
  see _PipelinedFetch).

Backends: 'flax' (HF Flax checkpoints — the native path), 'torch' (CPU
fallback for torch-only checkpoints), 'auto' (flax then torch). Config may
also inject `model` + `tokenizer` objects directly (tests, custom models).

Multi-chip: pass a 2-D ('data', 'model') `jax.sharding.Mesh` via the `mesh`
config key (build one with `parallel.tp.make_lm_mesh`). Parameters are
placed under Megatron-style tensor-parallel rules (attention qkv / MLP-up
column-parallel, attention-out / MLP-down row-parallel), inputs shard their
batch dim over 'data', and XLA's SPMD partitioner inserts the ICI
collectives — models larger than one chip's HBM become usable as feature
extractors, which the reference's single-device torch path cannot do.
"""

import logging

from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

from litcoder_core_tpu.features.base import BaseFeatureExtractor

logger = logging.getLogger(__name__)

_VALID_CONTEXT_TYPES = ["fullcontext", "nocontext", "halfcontext"]

# Decoder-only (strictly causal) model families for which the prefix-sharing
# fast path is numerically exact: position t's hidden state depends only on
# tokens[0:t+1].
_CAUSAL_MODEL_TYPES = {
    "gpt2", "gptj", "gpt_neo", "gpt_neox", "opt", "bloom", "codegen",
    "falcon", "llama", "mistral", "mixtral", "gemma", "gemma2", "phi",
    "phi3", "qwen2", "stablelm", "xglm", "mpt", "pythia",
}


def _pad_to_bucket(n: int, granularity: int = 32, minimum: int = 32) -> int:
    """Round a token length up to a bucket size (limits XLA recompiles)."""
    return max(minimum, ((n + granularity - 1) // granularity) * granularity)


def _find_prefix_chains(
    token_lists: List[List[int]], min_chain: int = 4
) -> Tuple[List[List[int]], List[int]]:
    """Split windows (in stimulus order) into prefix chains and singletons.

    A chain is a maximal run i..j where each window's token ids are a prefix
    of the next window's (the fullcontext growth pattern before the lookback
    budget truncates, and every nocontext/halfcontext segment —
    reference base_processor.py:106-217). Chains shorter than `min_chain`
    are returned as singleton indices (the batched-window path handles them).
    """
    chains: List[List[int]] = []
    singles: List[int] = []
    i, n = 0, len(token_lists)
    while i < n:
        j = i
        while (
            j + 1 < n
            and len(token_lists[j]) <= len(token_lists[j + 1])
            and token_lists[j + 1][: len(token_lists[j])] == token_lists[j]
        ):
            j += 1
        members = list(range(i, j + 1))
        if len(members) >= min_chain:
            chains.append(members)
        else:
            singles.extend(members)
        i = j + 1
    return chains, singles


class _PipelinedFetch:
    """Bounded in-flight queue: overlap host work with device compute.

    The extraction wall on the tunneled TPU is NOT the MXU (bf16 moved it
    1.03x — VERDICT r4): each synchronous `np.asarray(forward(...))` pays
    a full dispatch + D2H round trip while the device sits idle. JAX
    dispatch is asynchronous, so holding up to `depth` un-fetched results
    lets batch k+1..k+depth compute (and their H2D land) while batch k's
    pooled features stream back — the classic double-buffered pipeline,
    depth-generalized. `fetch_wait_s` accumulates the host time actually
    blocked on device results (the benchmark's stage breakdown).
    """

    def __init__(self, depth: int, sink):
        from collections import deque

        self._queue = deque()
        self._depth = max(1, int(depth))
        self._sink = sink  # sink(np_result, meta) -> None
        self.fetch_wait_s = 0.0

    def push(self, device_result, meta) -> None:
        self._queue.append((device_result, meta))
        if len(self._queue) > self._depth:
            self._drain_one()

    def _drain_one(self) -> None:
        import time

        dev, meta = self._queue.popleft()
        t0 = time.perf_counter()
        arr = np.asarray(dev, dtype=np.float32)
        self.fetch_wait_s += time.perf_counter() - t0
        self._sink(arr, meta)

    def flush(self) -> None:
        while self._queue:
            self._drain_one()


class LanguageModelFeatureExtractor(BaseFeatureExtractor):
    """Batched all-layer LM feature extractor.

    Config keys (superset of reference language_model.py:17-34):
        model_name (str, required), layer_idx (int), hook_type
        ('hook_resid_pre' | 'hook_resid_post'), last_token (bool),
        context_type, backend ('auto'|'flax'|'torch'), batch_size (int),
        dtype ('float32'|'bfloat16' — forward compute dtype on TPU),
        model / tokenizer (optional injected instances).
    """

    def __init__(self, config: Dict[str, Any]):
        super().__init__(config)
        self.model_name = config["model_name"]
        self.layer_idx = config.get("layer_idx", -1)
        self.hook_type = config.get("hook_type", "hook_resid_pre")
        self.last_token = config.get("last_token", True)
        self.context_type = config.get("context_type", "fullcontext")
        self.backend = config.get("backend", "auto")
        self.batch_size = int(config.get("batch_size", 64))
        # In-flight forwards held before blocking on a fetch (see
        # _PipelinedFetch). 1 = the old fully synchronous behavior.
        self.pipeline_depth = int(config.get("pipeline_depth", 4))
        # Host-side stage split of the last extract_* call (benchmark /
        # profiling surface): tokenize_s, prep_s, fetch_wait_s, total_s.
        self.last_stage_seconds: Dict[str, float] = {}
        self.compute_dtype = config.get("dtype", "float32")
        # 'auto' | True | False: share one forward across windows that are
        # token-prefixes of each other (exact for causal decoders).
        self.prefix_sharing = config.get("prefix_sharing", "auto")

        self._model = config.get("model")
        self._tokenizer = config.get("tokenizer")
        self._forward_fn = None
        self._chain_forward_fn = None
        if self._model is None or self._tokenizer is None:
            self._load_model()
        else:
            # Injected models default to the flax path ('auto' is a loading
            # policy, not a runnable backend — cf. speech_model.py).
            backend = config.get("backend", "flax")
            self.backend = "flax" if backend == "auto" else backend
        self._configure_dims()

        if self.compute_dtype == "bfloat16" and self.backend != "flax":
            raise ValueError(
                "dtype='bfloat16' requires the flax backend "
                f"(got backend={self.backend!r})"
            )
        self._cast_params = None
        # bf16 needs a module whose linen dtype is bf16: HF flax layers
        # pass dtype=self.dtype to Dense/LayerNorm, and a float32 module
        # would promote bf16 params right back to f32 compute. The sibling
        # shares self._model.params (passed explicitly per forward).
        self._compute_model = self._model
        if self.compute_dtype == "bfloat16":
            import jax.numpy as jnp

            self._compute_model = type(self._model)(
                self._model.config, dtype=jnp.bfloat16, _do_init=False
            )

        self.mesh = config.get("mesh")
        self._sharded_params = None
        if self.mesh is not None:
            if self.backend != "flax":
                raise ValueError(
                    "mesh-sharded extraction requires the flax backend "
                    f"(got backend={self.backend!r})"
                )
            from litcoder_core_tpu.parallel.tp import shard_lm_params

            # Cast BEFORE sharding: bf16 halves the per-device param
            # footprint and the replication traffic.
            self._sharded_params = shard_lm_params(self._maybe_cast_tree(
                self._model.params), self.mesh)

    # ------------------------------------------------------------------ setup

    def _load_model(self) -> None:
        from transformers import AutoTokenizer

        self._tokenizer = AutoTokenizer.from_pretrained(self.model_name)
        last_err = None
        if self.backend in ("auto", "flax"):
            try:
                from transformers import FlaxAutoModel

                self._model = FlaxAutoModel.from_pretrained(self.model_name)
                self.backend = "flax"
                return
            except Exception as e:  # no flax weights / no flax support
                last_err = e
                if self.backend == "flax":
                    raise
        if self.backend in ("auto", "torch"):
            import torch
            from transformers import AutoModel

            self._model = AutoModel.from_pretrained(self.model_name)
            self._model.eval()
            torch.set_grad_enabled(False)
            self.backend = "torch"
            return
        raise RuntimeError(
            f"Could not load {self.model_name} on backend {self.backend}: "
            f"{last_err}"
        )

    def _configure_dims(self) -> None:
        cfg = self._model.config
        self.d_model = int(
            getattr(cfg, "hidden_size", None) or getattr(cfg, "n_embd", 0)
        )
        self.n_layers = int(
            getattr(cfg, "num_hidden_layers", None) or getattr(cfg, "n_layer", 0)
        )

    # --------------------------------------------------------------- tokenize

    def _encode(self, text: str) -> List[int]:
        try:
            # No auto-added specials: tokenizers that add their own BOS/EOS
            # (llama etc.) would otherwise double the BOS below or make
            # last-token pooling read an EOS state.
            ids = self._tokenizer.encode(text, add_special_tokens=False)
        except TypeError:  # plain callables / stub tokenizers
            ids = self._tokenizer.encode(text)
        bos = self._tokenizer.bos_token_id
        # TransformerLens prepend_bos=True parity (language_model.py:140-141):
        # every sequence starts with exactly one BOS.
        if bos is not None:
            ids = [bos] + ids
        return ids

    # ---------------------------------------------------------------- forward

    def _flax_forward_fn(self):
        """Jitted (params, ids, mask) -> (n_layers+1, B, D) pooled states.

        Params are an explicit argument (NOT a closure capture) so the model
        weights are traced inputs rather than constants baked into the
        executable — closure capture would const-fold 100M+ weights into
        every compiled length bucket.
        """
        if self._forward_fn is not None:
            return self._forward_fn

        import jax
        import jax.numpy as jnp

        model = self._compute_model
        last_token = self.last_token

        @jax.jit
        def forward(params, input_ids, attention_mask):
            out = model(
                input_ids=input_ids,
                attention_mask=attention_mask,
                params=params,
                output_hidden_states=True,
                train=False,
            )
            # Pool each layer BEFORE stacking: stacking first materializes
            # an (L+1, B, T, D) copy of every hidden state — at GPT-2-small
            # shapes that is the peak-HBM term and caps the batch size the
            # pipelined dispatch can use.
            if last_token:
                idx = jnp.maximum(
                    attention_mask.sum(axis=-1).astype(jnp.int32) - 1, 0
                )  # (B,)
                rows = jnp.arange(input_ids.shape[0])
                pooled = jnp.stack(
                    [h[rows, idx, :] for h in out.hidden_states]
                )  # (L+1, B, D)
            else:
                # Accumulate the masked mean in float32: a bf16 reduction
                # over hundreds of tokens loses ~2 mantissa bits per
                # doubling (the gather above is accumulation-free).
                mask = attention_mask.astype(jnp.float32)  # (B, T)
                den = jnp.maximum(mask.sum(axis=-1), 1.0)[:, None]
                pooled = jnp.stack([
                    jnp.einsum("btd,bt->bd", h.astype(jnp.float32), mask)
                    / den
                    for h in out.hidden_states
                ])
            return pooled.astype(jnp.float32)

        self._forward_fn = forward
        return forward

    def _flax_chain_forward_fn(self):
        """Jitted (params, ids, mask, positions) -> (L+1, B, K, D).

        One forward over each chain-final sequence; the pooled feature of the
        chain member ending at token position p is read off at p:
        - last-token pooling: hidden_states[:, b, p, :] (causal attention =>
          identical to running the prefix alone);
        - mean pooling: cumulative mean over positions 0..p (every prefix
          token is real by construction, so masked mean == cumsum/(p+1)).
        `positions` is (B, K) int32, padded by repeating a valid position.
        """
        if self._chain_forward_fn is not None:
            return self._chain_forward_fn

        import jax
        import jax.numpy as jnp

        model = self._compute_model
        last_token = self.last_token

        @jax.jit
        def forward(params, input_ids, attention_mask, positions):
            out = model(
                input_ids=input_ids,
                attention_mask=attention_mask,
                params=params,
                output_hidden_states=True,
                train=False,
            )
            rows = jnp.arange(input_ids.shape[0])[:, None]  # (B, 1)
            # Per-layer pooling, stacked afterwards: avoids materializing
            # the (L+1, B, T, D) stack (cf. the batched forward).
            if last_token:
                pooled = jnp.stack(
                    [h[rows, positions, :] for h in out.hidden_states]
                )  # (L+1, B, K, D)
            else:
                # float32 cumsum: bf16 running sums drift over long
                # prefixes (cf. the batched forward's masked mean).
                denom = (positions + 1).astype(jnp.float32)  # (B, K)
                pooled = jnp.stack([
                    jnp.cumsum(h.astype(jnp.float32), axis=1)[
                        rows, positions, :]
                    / denom[:, :, None]
                    for h in out.hidden_states
                ])
            return pooled.astype(jnp.float32)

        self._chain_forward_fn = forward
        return forward

    def _torch_forward(self, input_ids: np.ndarray,
                       attention_mask: np.ndarray) -> np.ndarray:
        import torch

        with torch.no_grad():
            out = self._model(
                input_ids=torch.tensor(input_ids),
                attention_mask=torch.tensor(attention_mask),
                output_hidden_states=True,
            )
            hs = torch.stack(list(out.hidden_states))  # (L+1, B, T, D)
            mask = torch.tensor(attention_mask, dtype=hs.dtype)
            if self.last_token:
                idx = torch.clamp(
                    torch.tensor(attention_mask).sum(-1) - 1, min=0
                )
                pooled = hs[:, torch.arange(hs.shape[1]), idx, :]
            else:
                num = torch.einsum("lbtd,bt->lbd", hs, mask)
                den = mask.sum(-1).clamp(min=1.0)[None, :, None]
                pooled = num / den
            return pooled.float().cpu().numpy()

    def _maybe_cast_tree(self, params):
        """Cast floating leaves to the configured compute dtype.

        dtype='bfloat16' runs the transformer forward in bf16 on the MXU
        (~2x matmul throughput + half the weight/activation HBM traffic);
        pooled features are cast back to float32 on the way out. The fp32
        default keeps the cross-backend parity contract
        (tests/test_cross_backend_parity.py) — bf16 is the opt-in fast
        path for large extraction sweeps, same spirit as the solver's
        fast_scan.
        """
        if self.compute_dtype != "bfloat16":
            return params
        import jax
        import jax.numpy as jnp

        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
            params,
        )

    def _params(self):
        """Forward params: the TP-sharded tree when a mesh is configured."""
        if self._sharded_params is not None:
            return self._sharded_params
        if self.compute_dtype == "bfloat16":
            if self._cast_params is None:
                self._cast_params = self._maybe_cast_tree(self._model.params)
            return self._cast_params
        return self._model.params

    def _prep_inputs(self, *arrays: np.ndarray):
        """Pad batch rows to the mesh's 'data' extent and shard them.

        Padding rows carry an all-zero attention mask (pooling gathers
        position 0, which the caller slices off). Returns (arrays, n_pad).
        """
        if self.mesh is None:
            return arrays, 0
        from litcoder_core_tpu.parallel.tp import pad_and_shard

        return pad_and_shard(arrays, self.mesh)

    def _prefix_sharing_enabled(self) -> bool:
        if self.prefix_sharing in (True, False):
            return bool(self.prefix_sharing)
        model_type = getattr(self._model.config, "model_type", "")
        return model_type in _CAUSAL_MODEL_TYPES

    def _run_chain_batches(self, token_lists, chains, pooled_all,
                           pad_id) -> None:
        """Prefix-chain fast path: one forward per chain-final sequence.

        Replaces the reference's per-word full-prefix recompute
        (language_model.py:103-118) with O(total tokens) work: all members
        of a prefix chain are pooled from a single causal forward. Chains are
        grouped by padded length and batched; member positions are gathered
        on device.
        """
        batches: Dict[int, List[List[int]]] = {}
        for chain in chains:
            bucket = _pad_to_bucket(len(token_lists[chain[-1]]))
            batches.setdefault(bucket, []).append(chain)

        def sink(pooled, batch):
            # pooled: (L+1, B(+pad), K, D) — padded rows never indexed.
            for row, chain in enumerate(batch):
                pooled_all[:, chain, :] = pooled[:, row, :len(chain), :]

        forward = self._flax_chain_forward_fn()
        pipe = _PipelinedFetch(self.pipeline_depth, sink)
        for bucket, group in batches.items():
            for s in range(0, len(group), self.batch_size):
                batch = group[s:s + self.batch_size]
                kmax = _pad_to_bucket(max(len(c) for c in batch),
                                      granularity=8, minimum=8)
                b = len(batch)
                ids = np.full((b, bucket), pad_id, np.int32)
                mask = np.zeros((b, bucket), np.int32)
                pos = np.zeros((b, kmax), np.int32)
                for row, chain in enumerate(batch):
                    final = token_lists[chain[-1]][:bucket]
                    ids[row, :len(final)] = final
                    mask[row, :len(final)] = 1
                    ends = [min(len(token_lists[j]), bucket) - 1
                            for j in chain]
                    pos[row, :len(chain)] = ends
                    pos[row, len(chain):] = ends[-1]  # padded gathers
                (ids, mask, pos), _ = self._prep_inputs(ids, mask, pos)
                pipe.push(forward(self._params(), ids, mask, pos), batch)
        pipe.flush()
        self.last_stage_seconds["fetch_wait_s"] = round(
            self.last_stage_seconds.get("fetch_wait_s", 0.0)
            + pipe.fetch_wait_s, 4)

    def _tokenize_timed(self, stimuli, nonempty) -> List[List[int]]:
        import time

        t0 = time.perf_counter()
        token_lists = [self._encode(stimuli[i]) for i in nonempty]
        self.last_stage_seconds = {
            "tokenize_s": round(time.perf_counter() - t0, 4),
            "fetch_wait_s": 0.0,
        }
        return token_lists

    def _run_batches(self, token_lists: List[List[int]]) -> np.ndarray:
        """Run all nonempty token lists; returns (n_layers+1, N, D)."""
        import time

        t0 = time.perf_counter()
        n = len(token_lists)
        pooled_all = np.zeros(
            (self.n_layers + 1, n, self.d_model), np.float32
        )
        pad_id = (self._tokenizer.pad_token_id
                  or self._tokenizer.eos_token_id or 0)

        singles = list(range(n))
        if self.backend == "flax" and self._prefix_sharing_enabled():
            chains, singles = _find_prefix_chains(token_lists)
            if chains:
                logger.info(
                    "prefix sharing: %d windows collapse into %d forwards",
                    sum(len(c) for c in chains), len(chains),
                )
                self._run_chain_batches(token_lists, chains, pooled_all,
                                        pad_id)

        n_single = len(singles)
        order = sorted(singles, key=lambda i: len(token_lists[i]))

        def sink(pooled, meta):
            batch_idx, n_pad = meta
            if n_pad:
                pooled = pooled[:, :-n_pad, :]
            pooled_all[:, batch_idx, :] = pooled

        pipe = _PipelinedFetch(self.pipeline_depth, sink)
        i = 0
        while i < n_single:
            batch_idx = order[i:i + self.batch_size]
            max_len = max(len(token_lists[j]) for j in batch_idx)
            bucket = _pad_to_bucket(max_len)
            ids = np.full((len(batch_idx), bucket), pad_id, np.int32)
            mask = np.zeros((len(batch_idx), bucket), np.int32)
            for row, j in enumerate(batch_idx):
                toks = token_lists[j][:bucket]
                ids[row, :len(toks)] = toks
                mask[row, :len(toks)] = 1
            if self.backend == "flax":
                (ids, mask), n_pad = self._prep_inputs(ids, mask)
                pipe.push(self._flax_forward_fn()(self._params(), ids, mask),
                          (batch_idx, n_pad))
            else:
                sink(self._torch_forward(ids, mask), (batch_idx, 0))
            i += self.batch_size
        pipe.flush()
        self.last_stage_seconds["fetch_wait_s"] = round(
            self.last_stage_seconds.get("fetch_wait_s", 0.0)
            + pipe.fetch_wait_s, 4)
        total = time.perf_counter() - t0
        self.last_stage_seconds["forward_total_s"] = round(total, 4)
        # Everything the host did while NOT blocked on the device:
        # tokenize happened earlier; this is pad/bucket/dispatch/writeback.
        self.last_stage_seconds["host_prep_s"] = round(
            total - self.last_stage_seconds["fetch_wait_s"], 4)
        return pooled_all

    # ------------------------------------------------------------- public API

    def extract_all_layers(self, stimuli: Union[str, List[str]],
                           **kwargs) -> Dict[int, np.ndarray]:
        """All-layer features: {layer_idx: (n_texts, d_model)}.

        Layer i == TransformerLens `blocks.i.hook_resid_pre` == HF
        hidden_states[i] (hook_resid_post shifts by one). Mirrors
        reference extract_all_layers (language_model.py:83-120) without the
        per-text forward loop.
        """
        if isinstance(stimuli, str):
            stimuli = [stimuli]
        n = len(stimuli)
        nonempty = [i for i, t in enumerate(stimuli) if t != ""]
        logger.info("Extracting all layers for %d texts (%d nonempty)",
                    n, len(nonempty))

        hs_offset = 1 if self.hook_type == "hook_resid_post" else 0
        out = {
            layer: np.zeros((n, self.d_model), np.float32)
            for layer in range(self.n_layers)
        }
        if nonempty:
            token_lists = self._tokenize_timed(stimuli, nonempty)
            pooled = self._run_batches(token_lists)  # (L+1, N, D)
            for layer in range(self.n_layers):
                out[layer][nonempty] = pooled[layer + hs_offset]
        return out

    def extract_features(self, stimuli: Union[str, List[str]],
                         layer_idx: Optional[int] = None,
                         **kwargs) -> np.ndarray:
        """Single-layer features (n_texts, d_model)
        (reference: language_model.py:49-81)."""
        if layer_idx is None:
            layer_idx = self.layer_idx
        layer_idx = self._resolve_layer(layer_idx)
        if isinstance(stimuli, str):
            stimuli = [stimuli]
        n = len(stimuli)
        nonempty = [i for i, t in enumerate(stimuli) if t != ""]
        hs_offset = 1 if self.hook_type == "hook_resid_post" else 0
        out = np.zeros((n, self.d_model), np.float32)
        if nonempty:
            token_lists = self._tokenize_timed(stimuli, nonempty)
            pooled = self._run_batches(token_lists)
            out[nonempty] = pooled[layer_idx + hs_offset]
        return out

    def _resolve_layer(self, layer_idx: int) -> int:
        """Normalize a block index to [0, n_layers): negatives count from the
        end like Python indexing (-1 = last block). Out-of-range raises —
        the reference fails loudly too ('blocks.{i}.hook_resid_pre' KeyError,
        language_model.py:145); silently indexing hidden_states with a
        negative would return a DIFFERENT representation (e.g. ln_f output)."""
        resolved = layer_idx + self.n_layers if layer_idx < 0 else layer_idx
        if not 0 <= resolved < self.n_layers:
            raise ValueError(
                f"layer_idx {layer_idx} out of range for a "
                f"{self.n_layers}-block model"
            )
        return resolved

    # ------------------------------------------------------------- validation

    def _validate_config(self) -> None:
        if "model_name" not in self.config:
            raise ValueError("Missing required parameter: model_name")
        if "layer_idx" in self.config and not isinstance(
            self.config["layer_idx"], int
        ):
            raise ValueError("layer_idx must be an integer")
        if "context_type" in self.config:
            if self.config["context_type"] not in _VALID_CONTEXT_TYPES:
                raise ValueError(
                    f"context_type must be one of {_VALID_CONTEXT_TYPES}"
                )
        if self.config.get("dtype", "float32") not in ("float32",
                                                       "bfloat16"):
            raise ValueError(
                "dtype must be 'float32' or 'bfloat16', got "
                f"{self.config['dtype']!r}"
            )
