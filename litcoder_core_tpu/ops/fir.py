"""FIR (finite impulse response) delay expansion as a jittable array op.

Behavioral contract from reference encoding/features/FIR_expander.py:24-43
(and the duplicate encoding/utils.py:62-83): for each delay d, shift the
(time, feature) stimulus matrix down by d rows (zero- or circular-padded) and
hstack the shifted copies -> (time, feature * n_delays).

TPU notes: implemented with jnp.roll + masking, so it fuses into whatever
consumes it under jit (no host copies, no Python loop over time).
"""

from typing import Iterable

import jax.numpy as jnp


def make_delayed(stim, delays: Iterable[int], circpad: bool = False):
    """Create the delayed-copies design matrix.

    Args:
        stim: (n_timepoints, n_features) array.
        delays: iterable of integer delays (positive = past stimuli predict
            current response, the HRF convention).
        circpad: circular instead of zero padding.

    Returns:
        (n_timepoints, n_features * len(delays)) array, column blocks ordered
        by the `delays` iterable like the reference.
    """
    stim = jnp.asarray(stim)
    nt = stim.shape[0]
    delays = list(delays)
    blocks = []
    rows = jnp.arange(nt)
    for d in delays:
        if d == 0:
            blocks.append(stim)
            continue
        rolled = jnp.roll(stim, d, axis=0)
        if circpad:
            blocks.append(rolled)
        else:
            if d > 0:
                valid = rows >= d
            else:
                valid = rows < nt + d
            blocks.append(jnp.where(valid[:, None], rolled, 0.0))
    return jnp.concatenate(blocks, axis=1)
