"""FIR expander class API (reference: encoding/features/FIR_expander.py:6-73).

The math lives in litcoder_core_tpu.ops.fir (jittable); this class keeps the
reference's object API (FIR.make_delayed / FIR(delays).expand / helpers) and
returns numpy for host-side pipeline stages.
"""

from dataclasses import dataclass
from typing import Iterable, Optional

import numpy as np

from litcoder_core_tpu.ops import fir as fir_ops


@dataclass
class FIR:
    """FIR delay expander: FIR.make_delayed(stim, delays) or
    FIR(delays, circpad).expand(stim)."""

    delays: Optional[Iterable[int]] = None
    circpad: bool = False

    def expand(self, stim: np.ndarray) -> np.ndarray:
        if self.delays is None:
            raise ValueError("delays must be provided for instance usage of FIR")
        return FIR.make_delayed(stim, self.delays, self.circpad)

    @staticmethod
    def make_delayed(stim: np.ndarray, delays: Iterable[int],
                     circpad: bool = False) -> np.ndarray:
        """Delayed-copies design matrix, (T, D*len(delays)).
        Matches reference FIR_expander.py:24-43 / utils.py:62-83."""
        return np.asarray(fir_ops.make_delayed(stim, delays, circpad))

    def n_delays(self) -> int:
        return len(list(self.delays)) if self.delays is not None else 0

    def output_dim(self, input_dim: int) -> int:
        return input_dim * self.n_delays()

    def valid_length(self, nt: int) -> int:
        """Non-padded timepoints; nt when circpad (FIR_expander.py:53-64)."""
        if self.delays is None:
            raise ValueError("delays must be provided")
        if self.circpad:
            return nt
        max_shift = max(abs(d) for d in self.delays)
        return max(0, nt - max_shift)

    def summary(self, input_dim: Optional[int] = None,
                nt: Optional[int] = None) -> str:
        msg = f"FIR(delays={list(self.delays)}, circpad={self.circpad})"
        if input_dim is not None:
            msg += f"\n- Output dim: {self.output_dim(input_dim)}"
        if nt is not None:
            msg += f"\n- Valid length: {self.valid_length(nt)}"
        return msg
