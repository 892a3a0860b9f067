"""Speech feature extraction (Whisper-encoder / Wav2Vec2 / HuBERT), TPU-native.

Reference behavior (encoding/features/speech_model.py:24-251): sliding windows
of `context_size` seconds at `chunk_size`-second strides, ONE full encoder
forward per window in a Python loop, pooling 'last'/'mean' over encoder time,
layers 0-based over blocks (embeddings hidden_states[0] excluded).

TPU redesign:
- all windows are materialized as one (n_chunks, window_samples) batch via a
  strided view (they are fixed-length by construction — static shapes);
- windows run through the encoder in jitted BATCHES, capturing all hidden
  states per pass, instead of one forward per 0.1 s stride;
- audio I/O is host-side: WAV loading via the stdlib/scipy path and
  polyphase resampling via scipy.signal (torchaudio is not required).

Backends mirror the LM extractor: 'flax' (native), 'torch' (CPU fallback),
'auto'. Config may inject `model` + `feature_extractor` instances.
"""

import logging
from typing import Optional, Tuple, Union

import numpy as np

from litcoder_core_tpu.features.base import BaseFeatureExtractor

logger = logging.getLogger(__name__)


def load_audio(wav_path: str, target_sample_rate: int = 16000) -> np.ndarray:
    """Load audio -> mono float32 at target rate (reference: speech_model.py:121-128).

    Uses soundfile if present, else scipy.io.wavfile; resamples with
    scipy.signal.resample_poly (polyphase — same family torchaudio uses).
    """
    from fractions import Fraction

    data = None
    sr = None
    try:
        import soundfile as sf  # optional

        data, sr = sf.read(wav_path, dtype="float32", always_2d=True)
        data = data.T  # (channels, n)
    except Exception:
        from scipy.io import wavfile

        sr, raw = wavfile.read(wav_path)
        raw = np.atleast_2d(raw.T if raw.ndim == 2 else raw[None, :])
        if raw.dtype.kind == "i":
            scale = float(np.iinfo(raw.dtype).max)
            data = raw.astype(np.float32) / scale
        elif raw.dtype.kind == "u":
            info = np.iinfo(raw.dtype)
            data = (raw.astype(np.float32) - (info.max + 1) / 2) / (
                (info.max + 1) / 2
            )
        else:
            data = raw.astype(np.float32)
    wav = data.mean(axis=0)  # mono mix
    if sr != target_sample_rate:
        from scipy.signal import resample_poly

        frac = Fraction(target_sample_rate, int(sr)).limit_denominator(1000)
        wav = resample_poly(wav, frac.numerator, frac.denominator).astype(
            np.float32
        )
    return wav.astype(np.float32)


class SpeechFeatureExtractor(BaseFeatureExtractor):
    """Windowed speech-encoder features.

    extract_features(wav_path, layer) -> (features [n_chunks, D], times)
    extract_all_layers(wav_path) -> ({layer: [n_chunks, D]}, times)
    """

    def __init__(
        self,
        model_name: str,
        chunk_size: float,
        context_size: float,
        layer: Union[str, int] = "last",
        pool: str = "last",
        device: Optional[str] = None,
        target_sample_rate: int = 16000,
        disable_tqdm: bool = False,
        backend: str = "auto",
        batch_size: int = 8,
        model=None,
        feature_extractor=None,
        mesh=None,
        dtype: str = "float32",
        **_unused,
    ):
        if pool not in {"last", "mean"}:
            raise ValueError("pool must be 'last' or 'mean'")
        if dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"dtype must be 'float32' or 'bfloat16', got {dtype!r}"
            )
        # BaseFeatureExtractor bookkeeping (config kept for parity/debug).
        self.config = {
            "model_name": model_name, "chunk_size": chunk_size,
            "context_size": context_size, "pool": pool,
        }
        self.model_name = model_name
        self.chunk_size = float(chunk_size)
        self.context_size = float(context_size)
        self.layer = layer
        self.pool = pool
        self.target_sample_rate = int(target_sample_rate)
        self.disable_tqdm = disable_tqdm
        self.backend = backend
        self.batch_size = int(batch_size)
        self.compute_dtype = dtype
        self._cast_params = None
        self._forward_fn = None

        self._model = model
        self.feature_extractor = feature_extractor
        if self._model is None:
            self._load_model()
        else:
            self.backend = "flax" if backend == "auto" else backend
        self.model_type = getattr(
            self._model.config, "model_type", ""
        ).lower()
        self._forward_key = (
            "input_features" if self.model_type == "whisper" else "input_values"
        )

        # 2-D ('data', 'model') mesh: Megatron-style TP placement of the
        # encoder params + window batches sharded over 'data'
        # (parallel/tp.py; same contract as the LM extractor).
        if self.compute_dtype == "bfloat16" and self.backend != "flax":
            raise ValueError(
                "dtype='bfloat16' requires the flax backend "
                f"(got backend={self.backend!r})"
            )
        # bf16 needs a module whose linen dtype is bf16 (cf. the LM
        # extractor): HF flax layers promote params to the MODULE dtype,
        # so bf16 params under a float32 module would compute in f32.
        self._compute_model = self._model
        if self.compute_dtype == "bfloat16":
            import jax.numpy as jnp

            self._compute_model = type(self._model)(
                self._model.config, dtype=jnp.bfloat16, _do_init=False
            )

        self.mesh = mesh
        self._sharded_params = None
        if self.mesh is not None:
            if self.backend != "flax":
                raise ValueError(
                    "mesh-sharded extraction requires the flax backend "
                    f"(got backend={self.backend!r})"
                )
            from litcoder_core_tpu.parallel.tp import shard_lm_params

            # Cast BEFORE sharding: bf16 halves the per-device footprint.
            self._sharded_params = shard_lm_params(
                self._maybe_cast_tree(self._model.params), self.mesh)

    # ------------------------------------------------------------------ setup

    def _load_model(self) -> None:
        from transformers import AutoFeatureExtractor

        self.feature_extractor = AutoFeatureExtractor.from_pretrained(
            self.model_name
        )
        last_err = None
        if self.backend in ("auto", "flax"):
            try:
                from transformers import FlaxAutoModel

                self._model = FlaxAutoModel.from_pretrained(self.model_name)
                self.backend = "flax"
                return
            except Exception as e:
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

    def _maybe_cast_tree(self, params):
        """Cast floating leaves to bf16 when dtype='bfloat16' (the opt-in
        encoder fast path; pooled outputs come back float32)."""
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
        """Forward params: TP-sharded and/or dtype-cast as configured."""
        if self._sharded_params is not None:
            return self._sharded_params
        if self.compute_dtype == "bfloat16":
            if self._cast_params is None:
                self._cast_params = self._maybe_cast_tree(self._model.params)
            return self._cast_params
        return self._model.params

    # ------------------------------------------------------------- windowing

    def _windows(self, wav: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(n_chunks, context_samples) strided windows + end-times.

        Window i covers [i*chunk, i*chunk + context) ending at
        context + i*chunk samples (reference: speech_model.py:159-165).
        """
        chunk = int(self.chunk_size * self.target_sample_rate)
        context = int(self.context_size * self.target_sample_rate)
        total = wav.shape[0]
        if context <= 0 or chunk <= 0:
            raise ValueError("context_size and chunk_size must be > 0 seconds.")
        if total < context:
            return np.empty((0, 0), np.float32), np.array([])
        n_chunks = (total - context) // chunk + 1
        # True strided view: O(1) memory for the full window set (a fancy-
        # index gather would materialize n_chunks x context floats — ~6 GB
        # for 10 min of 16 kHz audio at 0.1 s stride). Batches are copied
        # lazily by the HF feature extractor per forward.
        windows = np.lib.stride_tricks.sliding_window_view(
            wav, context
        )[::chunk][:n_chunks]
        times = (context + np.arange(n_chunks) * chunk) / self.target_sample_rate
        return windows, times

    # ---------------------------------------------------------------- forward

    def _prepare_batch(self, windows: np.ndarray) -> np.ndarray:
        """HF preprocessing (log-mel for Whisper, normalization for w2v2)."""
        inputs = self.feature_extractor(
            [w for w in windows],
            sampling_rate=self.target_sample_rate,
            return_tensors="np",
        )
        return np.asarray(inputs[self._forward_key])

    def _flax_forward_fn(self):
        """Jitted (params, batch) -> pooled states; params passed explicitly
        so encoder weights are traced inputs, not baked-in constants."""
        if self._forward_fn is not None:
            return self._forward_fn

        import jax
        import jax.numpy as jnp

        model = self._compute_model
        pool = self.pool
        is_whisper = self.model_type == "whisper"
        key = self._forward_key

        @jax.jit
        def forward(params, batch):
            if is_whisper:
                out = model.encode(
                    input_features=batch, params=params,
                    output_hidden_states=True, train=False,
                )
            else:
                out = model(**{key: batch}, params=params,
                            output_hidden_states=True, train=False)
            # Pool per layer, then stack the small (B, D) results —
            # stacking the raw states first materializes an extra
            # (L+1, B, T, D) copy (cf. the LM extractor's forwards).
            if pool == "last":
                # Accumulation-free gather: exact in either compute dtype.
                return jnp.stack([h[:, -1, :] for h in out.hidden_states]
                                 ).astype(jnp.float32)
            # Mean over encoder time in float32: a bf16 reduction over
            # hundreds of frames drifts (cf. the LM extractor's pooling).
            return jnp.stack([h.astype(jnp.float32).mean(axis=1)
                              for h in out.hidden_states])

        self._forward_fn = forward
        return forward

    def _torch_forward(self, batch: np.ndarray) -> np.ndarray:
        import torch

        encoder = (self._model.get_encoder()
                   if self.model_type == "whisper" else self._model)
        with torch.no_grad():
            out = encoder(
                **{self._forward_key: torch.tensor(batch)},
                output_hidden_states=True,
            )
            hs = torch.stack(list(out.hidden_states))
            pooled = hs[:, :, -1, :] if self.pool == "last" else hs.mean(dim=2)
            return pooled.float().cpu().numpy()

    def _run_all(self, wav_path: str) -> Tuple[np.ndarray, np.ndarray]:
        """All windows through the encoder: (L+1, n_chunks, D), times.

        Forwards are pipelined (up to 4 in flight) so the HF host-side
        preprocessing of window k+1 (log-mel / normalization — the serial
        wall otherwise) overlaps the encoder compute and D2H of window k
        (cf. features.language_model._PipelinedFetch).
        """
        from litcoder_core_tpu.features.language_model import _PipelinedFetch

        wav = load_audio(wav_path, self.target_sample_rate)
        windows, times = self._windows(wav)
        if windows.shape[0] == 0:
            return np.empty((0, 0, 0), np.float32), times
        pooled_parts = {}

        def sink(pooled, meta):
            part, n_pad = meta
            if n_pad:
                pooled = pooled[:, :-n_pad, :]
            pooled_parts[part] = pooled

        pipe = _PipelinedFetch(4, sink)
        for part, lo in enumerate(range(0, windows.shape[0],
                                        self.batch_size)):
            batch = self._prepare_batch(windows[lo:lo + self.batch_size])
            if self.backend == "flax":
                params = self._params()
                n_pad = 0
                if self.mesh is not None:
                    from litcoder_core_tpu.parallel.tp import pad_and_shard

                    (batch,), n_pad = pad_and_shard((batch,), self.mesh)
                pipe.push(self._flax_forward_fn()(params, batch),
                          (part, n_pad))
            else:
                sink(self._torch_forward(batch), (part, 0))
        pipe.flush()
        ordered = [pooled_parts[p] for p in sorted(pooled_parts)]
        return np.concatenate(ordered, axis=1), times

    # ------------------------------------------------------------- public API

    def extract_features(self, wav_path: str,
                         layer: Union[str, int, None] = None, **kwargs):
        """Single-layer features: (features [n_chunks, D], times [n_chunks])."""
        layer = self.layer if layer is None else layer
        pooled, times = self._run_all(wav_path)
        if pooled.size == 0:
            return np.empty((0, 0)), times
        if layer == "last":
            feats = pooled[-1]
        else:
            feats = pooled[int(layer) + 1]  # skip embeddings hs[0]
        return feats, times

    def extract_all_layers(self, wav_path: str, **kwargs):
        """All-layer features: ({layer: [n_chunks, D]}, times)."""
        pooled, times = self._run_all(wav_path)
        if pooled.size == 0:
            return {}, times
        n_layers = pooled.shape[0] - 1
        return {li: pooled[li + 1] for li in range(n_layers)}, times

    def _validate_config(self) -> None:  # handled in __init__
        pass
