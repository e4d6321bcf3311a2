"""Multi-stream PointNet++ backbone with feature aggregation (H3DNet).

Equivalent of the reference `mmdet3d/models/backbones/multi_backbone.py`
(124 LoC): N independent PointNet2SASSG towers over the same cloud,
whose final FP features are concatenated and fused by a 1x1-conv MLP
into the hybrid ``hd_feature``. Per-stream outputs keep the reference's
``_net{i}`` suffix naming. Single cloud per call; vmap for batch.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .pointnet2 import PointNet2SASSG, SharedMLP


class MultiBackbone(nn.Module):
    num_streams: int = 4
    backbone_cfg: Optional[Dict] = None
    aggregation_mlp_channels: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool = False,
                 sa_indices=None) -> Dict:
        """(N, 3+C) cloud -> dict with per-stream fp outputs
        (``fp_*_net{i}``) and the fused ``hd_feature`` (S, C').

        ``sa_indices`` (host-precomputed chain) is shared by every
        stream — deterministic FPS gives each stream identical indices
        in the reference too."""
        cfg = self.backbone_cfg or {}
        ret: Dict[str, Any] = {}
        fp_feats = []
        out_channels = 0
        for i in range(self.num_streams):
            r = PointNet2SASSG(dtype=self.dtype, name=f"backbone{i}",
                               **cfg)(points, train,
                                      sa_indices=sa_indices)
            fp_feats.append(r["fp_features"][-1])
            out_channels += fp_feats[-1].shape[-1]
            for k, v in r.items():
                ret[f"{k}_net{i}"] = v

        agg = self.aggregation_mlp_channels or (
            out_channels // 2, out_channels // self.num_streams)
        hd = jnp.concatenate(fp_feats, axis=-1)
        ret["hd_feature"] = SharedMLP(tuple(agg), self.dtype,
                                      name="aggregation_layers")(hd, train)
        return ret
