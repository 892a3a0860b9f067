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
  (language_model.py:133-136, 170-175).

Backends: 'flax' (HF Flax checkpoints — the native path), 'torch' (CPU
fallback for torch-only checkpoints), 'auto' (flax then torch). Config may
also inject `model` + `tokenizer` objects directly (tests, custom models).
"""

import logging

from typing import Any, Dict, List, Optional, Union

import numpy as np

from litcoder_core_tpu.features.base import BaseFeatureExtractor

logger = logging.getLogger(__name__)

_VALID_CONTEXT_TYPES = ["fullcontext", "nocontext", "halfcontext"]


def _pad_to_bucket(n: int, granularity: int = 32, minimum: int = 32) -> int:
    """Round a token length up to a bucket size (limits XLA recompiles)."""
    return max(minimum, ((n + granularity - 1) // granularity) * granularity)


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
        self.compute_dtype = config.get("dtype", "float32")

        self._model = config.get("model")
        self._tokenizer = config.get("tokenizer")
        self._forward_fn = None
        if self._model is None or self._tokenizer is None:
            self._load_model()
        else:
            self.backend = config.get("backend", "flax")
        self._configure_dims()

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
        ids = self._tokenizer.encode(text)
        bos = self._tokenizer.bos_token_id
        # TransformerLens prepend_bos=True parity (language_model.py:140-141):
        # every sequence starts with BOS.
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

        model = self._model
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
            hs = jnp.stack(out.hidden_states)  # (L+1, B, T, D)
            mask = attention_mask.astype(hs.dtype)  # (B, T)
            if last_token:
                idx = jnp.maximum(
                    attention_mask.sum(axis=-1).astype(jnp.int32) - 1, 0
                )  # (B,)
                pooled = hs[:, jnp.arange(hs.shape[1]), idx, :]  # (L+1, B, D)
            else:
                num = jnp.einsum("lbtd,bt->lbd", hs, mask)
                den = jnp.maximum(mask.sum(axis=-1), 1.0)[None, :, None]
                pooled = num / den
            return pooled

        self._forward_fn = forward
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

    def _run_batches(self, token_lists: List[List[int]]) -> np.ndarray:
        """Run all nonempty token lists; returns (n_layers+1, N, D)."""
        n = len(token_lists)
        order = sorted(range(n), key=lambda i: len(token_lists[i]))
        pooled_all = np.zeros(
            (self.n_layers + 1, n, self.d_model), np.float32
        )
        pad_id = (self._tokenizer.pad_token_id
                  or self._tokenizer.eos_token_id or 0)

        i = 0
        while i < n:
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
                pooled = np.asarray(
                    self._flax_forward_fn()(self._model.params, ids, mask),
                    np.float32,
                )
            else:
                pooled = self._torch_forward(ids, mask)
            pooled_all[:, batch_idx, :] = pooled
            i += self.batch_size
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
            token_lists = [self._encode(stimuli[i]) for i in nonempty]
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
        if isinstance(stimuli, str):
            stimuli = [stimuli]
        n = len(stimuli)
        nonempty = [i for i, t in enumerate(stimuli) if t != ""]
        hs_offset = 1 if self.hook_type == "hook_resid_post" else 0
        out = np.zeros((n, self.d_model), np.float32)
        if nonempty:
            token_lists = [self._encode(stimuli[i]) for i in nonempty]
            pooled = self._run_batches(token_lists)
            out[nonempty] = pooled[layer_idx + hs_offset]
        return out

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
