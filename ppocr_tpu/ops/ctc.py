"""Greedy CTC decode.

The reference decodes on the host, one timestep at a time per crop
(ocr_rec.cpp:97-128). Here the O(T·V) part — argmax + max over the 6,625-way
softmax — runs on the TPU inside the rec jit (``ctc_topk_device``), so only
[N,T] int32 indices and [N,T] float32 probs cross the PCIe link instead of
[N,T,6625] floats (~166× less traffic). The tiny O(T) dedup/blank/join runs
on the host in vectorized numpy with the reference's exact keep rule.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def ctc_topk_device(logprobs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device half of greedy decode: per-timestep argmax index and max prob.

    ``logprobs``: [N, T, V] post-softmax probabilities (the rec graph ends in
    softmax). Returns ([N, T] int32, [N, T] float32).
    """
    idx = jnp.argmax(logprobs, axis=-1).astype(jnp.int32)
    val = jnp.max(logprobs, axis=-1)
    return idx, val


def ctc_greedy_collapse(
    indices: np.ndarray, probs: np.ndarray
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Host half: collapse repeats + drop blanks, per the reference rule.

    Keep timestep n iff ``idx[n] > 0 and not (n > 0 and idx[n] == idx[n-1])``
    (blank id is 0; note n==0 is always kept when non-blank). Confidence is
    the mean of kept max-probs; a crop with no kept steps gets NaN → the
    caller must skip it (reference: ``isnan → continue``).

    Returns (list of kept-index arrays per item, confidence[N]).
    """
    indices = np.asarray(indices)
    probs = np.asarray(probs)
    n, t = indices.shape
    keep = indices > 0
    keep[:, 1:] &= indices[:, 1:] != indices[:, :-1]
    out_indices = [indices[i][keep[i]] for i in range(n)]
    counts = keep.sum(axis=1)
    with np.errstate(invalid="ignore"):
        conf = np.where(
            counts > 0,
            np.where(keep, probs, 0.0).sum(axis=1) / np.maximum(counts, 1),
            np.nan,
        )
    return out_indices, conf.astype(np.float32)


def ctc_greedy_decode_np(
    probs: np.ndarray, charset: Sequence[str]
) -> Tuple[List[str], np.ndarray]:
    """Full host reference decode: [N, T, V] probs → (texts, confidences).

    ``charset`` is the label list with blank at index 0 (see
    :func:`ppocr_tpu.pipeline.charset.load_charset`). Items with no kept
    timesteps return "" with NaN confidence.
    """
    idx = probs.argmax(-1).astype(np.int32)
    val = probs.max(-1)
    kept, conf = ctc_greedy_collapse(idx, val)
    texts = ["".join(charset[i] for i in k) for k in kept]
    return texts, conf
