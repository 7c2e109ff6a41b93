"""CTC decoding: greedy (reference-parity) and prefix beam search (beyond
the reference, which is greedy-only — ocr_rec.cpp:97-128).

The reference decodes on the host, one timestep at a time per crop
(ocr_rec.cpp:97-128). Here the O(T·V) part — argmax + max over the 6,625-way
softmax — runs on the TPU inside the rec jit (``ctc_topk_device``), so only
[N,T] int32 indices and [N,T] float32 probs cross the PCIe link instead of
[N,T,6625] floats (~166× less traffic). The tiny O(T) dedup/blank/join runs
on the host in vectorized numpy with the reference's exact keep rule.

Beam search splits the same way: the device prunes each timestep to its
top-k candidate symbols (+ the blank probability), so only [N,T,k] crosses
the link; the host then runs the standard CTC prefix beam search (Hannun et
al. 2014) over the pruned lattice, summing blank/non-blank path mass per
prefix — which recovers labelings greedy misses when probability mass is
split between blank and repeat alignments.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def ctc_topk_device(
    probs: jnp.ndarray, use_pallas: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device half of greedy decode: per-timestep argmax index and max prob.

    ``probs``: [N, T, V] post-softmax probabilities (the rec graph ends in
    softmax — NOT log-probs; negative inputs would silently produce
    negative "confidences" downstream). Returns ([N, T] int32, [N, T] f32).

    ``use_pallas`` selects the fused single-VMEM-pass kernel
    (ops.pallas_kernels.ctc_topk) — measured 4.2× faster than XLA's
    separate argmax+max at the fused serving shape [32,48,6625] on a v5e
    chip. Callers enable it on single-device TPU paths only (under a
    GSPMD mesh the jnp form shards transparently; pallas_call does not).
    """
    if use_pallas:
        from .pallas_kernels import ctc_topk_pallas

        return ctc_topk_pallas(probs)
    idx = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    val = jnp.max(probs, axis=-1)
    return idx, val


def ctc_beam_topk_device(
    probs: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Device half of beam decode: per-timestep top-k pruning.

    ``probs``: [N, T, V] post-softmax. Returns ([N,T,k] int32 candidate
    ids, [N,T,k] their probs, [N,T] blank prob) — ~V/k less egress than
    the full lattice while keeping everything beam search needs (blank is
    carried separately so pruning can never drop it).

    Blank (id 0) is masked out of the top-k input: it dominates most
    timesteps and would otherwise consume one of the k slots the host
    search then skips, so the effective candidate count was k−1
    (ADVICE r2). All k slots now carry non-blank symbols.
    """
    import jax.lax as lax

    probs = jnp.asarray(probs)
    blank = probs[..., 0]
    masked = probs.at[..., 0].set(-1.0)  # post-softmax probs are ≥ 0
    val, idx = lax.top_k(masked, k)
    return idx.astype(jnp.int32), val, blank


def ctc_beam_search(
    top_idx: np.ndarray,
    top_prob: np.ndarray,
    blank_prob: np.ndarray,
    beam_size: int = 10,
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Host half: CTC prefix beam search over the device-pruned lattice.

    Per prefix, track (p_blank, p_nonblank) path mass; extend with blank,
    with a repeat of the last symbol (merges into the same prefix only via
    the non-blank mass; crossing a blank starts a new copy), or with a new
    symbol. Keep the ``beam_size`` highest-mass prefixes per step.

    Returns (kept-index arrays per item, confidence[N]) like
    :func:`ctc_greedy_collapse`; confidence is the length-normalized prefix
    posterior (geometric mean per emitted char). An empty best prefix gets
    NaN so callers apply the reference's ``isnan → skip`` rule unchanged.
    """
    top_idx = np.asarray(top_idx)
    top_prob = np.asarray(top_prob, np.float64)
    blank_prob = np.asarray(blank_prob, np.float64)
    n, t, k = top_idx.shape
    results: List[np.ndarray] = []
    confs = np.zeros((n,), np.float32)
    for i in range(n):
        beams = {(): (1.0, 0.0)}  # prefix -> (blank mass, non-blank mass)
        for step in range(t):
            pb = blank_prob[i, step]
            nxt: dict = {}

            def add(pref, db, dnb):
                b0, nb0 = nxt.get(pref, (0.0, 0.0))
                nxt[pref] = (b0 + db, nb0 + dnb)

            cands = top_idx[i, step]
            cprobs = top_prob[i, step]
            for prefix, (b, nb) in beams.items():
                total = b + nb
                add(prefix, total * pb, 0.0)
                last = prefix[-1] if prefix else -1
                for c, p in zip(cands, cprobs):
                    c = int(c)
                    if c == 0:
                        continue  # blank handled via blank_prob above
                    if c == last:
                        # repeat without blank gap collapses into prefix
                        add(prefix, 0.0, nb * p)
                        # blank-gapped repeat emits a second copy
                        add(prefix + (c,), 0.0, b * p)
                    else:
                        add(prefix + (c,), 0.0, total * p)
            beams = dict(
                sorted(nxt.items(), key=lambda kv: -(kv[1][0] + kv[1][1]))[
                    :beam_size
                ]
            )
        best, (b, nb) = max(beams.items(), key=lambda kv: kv[1][0] + kv[1][1])
        results.append(np.array(best, np.int32))
        mass = b + nb
        confs[i] = (
            np.float32(mass ** (1.0 / len(best))) if best else np.float32("nan")
        )
    return results, confs


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
