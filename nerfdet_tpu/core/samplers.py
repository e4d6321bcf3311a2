"""Proposal samplers for two-stage heads (Part-A2 family).

Equivalent of the reference
`mmdet3d/core/bbox/samplers/iou_neg_piecewise_sampler.py:1-160`
(IoUNegPiecewiseSampler over mmdet's RandomSampler): sample a fixed
budget of proposals per scene, a capped fraction positive, with the
negatives drawn piecewise by their max-IoU so hard negatives dominate.

Two implementations:

- :func:`iou_neg_piecewise_sample` — host-side numpy, reference-exact
  semantics (per-piece quotas with shortfall carried into later pieces).
- :func:`sample_fixed_slots` — jit-safe static-shape variant: returns a
  fixed ``num``-slot index vector + validity mask, positives first, the
  piecewise negative preference encoded as a sort priority. Use inside
  jitted training steps.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np


def iou_neg_piecewise_sample(
        gt_inds: np.ndarray, max_overlaps: np.ndarray, num: int = 128,
        pos_fraction: float = 0.55,
        neg_piece_fractions: Sequence[float] = (0.8, 0.2),
        neg_iou_piece_thrs: Sequence[float] = (0.55, 0.1),
        rng: np.random.RandomState = None) -> Dict[str, np.ndarray]:
    """Reference-exact sampling (host side).

    Args:
        gt_inds: (P,) assigned GT index + 1 per proposal, 0 = negative
            (mmdet AssignResult convention).
        max_overlaps: (P,) max IoU with any GT.

    Returns dict(pos_inds, neg_inds, iou) — ``iou`` gathered over
    ``concat(pos, neg)`` as Part-A2 regresses it (`:152-157`).
    """
    rng = rng or np.random.RandomState(0)
    pos_inds = np.flatnonzero(gt_inds > 0)
    num_expected_pos = int(num * pos_fraction)
    if len(pos_inds) > num_expected_pos:
        pos_inds = rng.choice(pos_inds, num_expected_pos, replace=False)
    num_expected_neg = num - len(pos_inds)

    neg_inds = np.flatnonzero(gt_inds == 0)
    if len(neg_inds) > num_expected_neg:
        chosen = []
        extend = 0
        ious = max_overlaps[neg_inds]
        n_piece = len(neg_piece_fractions)
        for p in range(n_piece):
            if p == n_piece - 1:
                expected = num_expected_neg - sum(len(c) for c in chosen)
                lo = 0.0
            else:
                expected = int(
                    num_expected_neg * neg_piece_fractions[p]) + extend
                lo = neg_iou_piece_thrs[p + 1]
            hi = neg_iou_piece_thrs[p]
            piece = np.flatnonzero((ious >= lo) & (ious < hi))
            if len(piece) < expected:
                chosen.append(neg_inds[piece])
                extend = expected - len(piece)
            else:
                chosen.append(neg_inds[rng.choice(
                    piece, expected, replace=False)])
                extend = 0
        neg_inds = np.concatenate(chosen) if chosen else neg_inds[:0]

    iou = max_overlaps[np.concatenate([pos_inds, neg_inds])]
    return dict(pos_inds=pos_inds, neg_inds=neg_inds, iou=iou)


def sample_fixed_slots(gt_inds, max_overlaps, key, num: int = 128,
                       pos_fraction: float = 0.55,
                       neg_iou_piece_thrs: Sequence[float] = (0.55, 0.1)
                       ) -> Tuple:
    """Static-shape jit-safe sampler.

    Returns ``(inds (num,), is_pos (num,), valid (num,))``: positives
    (random order, capped at ``num * pos_fraction``) first, then
    negatives preferring the hard piece (IoU in
    [thrs[1], thrs[0])) over the easy one — the same preference the
    piecewise quotas express, realized as a priority sort so every
    shape stays static.
    """
    import jax
    import jax.numpy as jnp

    p = gt_inds.shape[0]
    r = jax.random.uniform(key, (p,))
    is_pos = gt_inds > 0
    cap = int(num * pos_fraction)

    # rank positives randomly; beyond-cap positives drop to negatives'
    # priority floor
    pos_priority = jnp.where(is_pos, r, jnp.inf)
    pos_order = jnp.argsort(pos_priority)  # positives first, random
    pos_sel = jnp.zeros(p, bool).at[pos_order[:cap]].set(True) & is_pos

    hard = (~is_pos) & (max_overlaps >= neg_iou_piece_thrs[1]) & (
        max_overlaps < neg_iou_piece_thrs[0])
    easy = (~is_pos) & (max_overlaps < neg_iou_piece_thrs[1])
    # priority bands: selected positives < hard negatives < easy
    # negatives < everything else
    priority = jnp.where(pos_sel, r,
                         jnp.where(hard, 2.0 + r,
                                   jnp.where(easy, 4.0 + r, 6.0 + r)))
    inds = jnp.argsort(priority)[:num]
    sel_pos = pos_sel[inds]
    valid = (is_pos | hard | easy)[inds]
    return inds, sel_pos, valid
