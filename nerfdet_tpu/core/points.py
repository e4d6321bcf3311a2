"""Point-cloud structure classes: Camera / Depth / LiDAR frames.

Equivalent of the reference's ``mmdet3d/core/points/`` package
(`base_points.py:6-365`, `cam_points.py`, `depth_points.py`,
`lidar_points.py`, `__init__.py:get_points_type`): a thin structured
wrapper over an (N, points_dim) float32 matrix with named attribute
channels, per-frame BEV flip / in-range conventions, and frame
conversion.

TPU-native placement: these live in the HOST data layer (plain numpy,
like `core/boxes.py` and the ETL/pipeline code) — device code consumes
the raw ``.tensor`` arrays under static shapes. In-place mutation
semantics (`rotate`/`flip`/`translate`/`scale` modify ``self``) match
the reference API so pipeline code ports one-to-one.

One deliberate deviation: the reference's scalar-angle rotation matrix
for ``axis == 0`` (`base_points.py:104-107`) is not a rotation matrix
(its rows mix axes); no subclass uses axis 0 (Camera uses 1,
Depth/LiDAR use 2). We use the standard right-handed rotation about
each axis instead.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from .box_modes import Box3DMode, convert_points_mode

__all__ = [
    "BasePoints", "CameraPoints", "DepthPoints", "LiDARPoints",
    "get_points_type",
]


def _rotation_rhs(angle: float, axis: int) -> np.ndarray:
    """The matrix M with ``rotated = xyz @ M``, reproducing the
    reference's observable per-axis semantics (`base_points.py:93-115`):
    axis 2 rotates +angle about z (x' = x cos - y sin); axis 1 rotates
    -angle about y in right-handed terms (x' = x cos - z sin — the
    camera frame's y-down yaw convention); axis 0 is the standard
    rotation about x (see the module-docstring deviation note)."""
    c, s = np.cos(angle), np.sin(angle)
    if axis in (2, -1):
        return np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], np.float32)
    if axis == 1:
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    if axis == 0:
        return np.array([[1, 0, 0], [0, c, s], [0, -s, c]], np.float32)
    raise ValueError(f"axis should be in range, got {axis}")


class BasePoints:
    """(N, points_dim) structured points (reference `base_points.py:6`).

    ``attribute_dims`` maps attribute names (e.g. ``"height"``,
    ``"color"``) to column indices (int or list of ints) beyond xyz.
    """

    rotation_axis = 0
    mode: Optional[Box3DMode] = None

    def __init__(self, tensor, points_dim: int = 3, attribute_dims=None):
        tensor = np.asarray(tensor, np.float32)
        if tensor.size == 0:
            tensor = tensor.reshape(0, points_dim)
        assert tensor.ndim == 2 and tensor.shape[-1] == points_dim, \
            f"expected (N, {points_dim}), got {tensor.shape}"
        self.tensor = tensor
        self.points_dim = points_dim
        self.attribute_dims = attribute_dims

    # -- accessors ----------------------------------------------------

    @property
    def coord(self) -> np.ndarray:
        return self.tensor[:, :3]

    @property
    def height(self) -> Optional[np.ndarray]:
        if self.attribute_dims and "height" in self.attribute_dims:
            return self.tensor[:, self.attribute_dims["height"]]
        return None

    @property
    def color(self) -> Optional[np.ndarray]:
        if self.attribute_dims and "color" in self.attribute_dims:
            return self.tensor[:, self.attribute_dims["color"]]
        return None

    @property
    def shape(self):
        return self.tensor.shape

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(\n    {self.tensor})"

    def __iter__(self):
        yield from self.tensor

    # -- geometry (in place, like the reference) ----------------------

    def shuffle(self, rng: Optional[np.random.RandomState] = None):
        """Shuffle the point order in place (`base_points.py:72-75`);
        the RNG is explicit here (the framework owns its streams)."""
        rng = rng or np.random
        self.tensor = self.tensor[rng.permutation(len(self))]

    def rotate(self, rotation, axis: Optional[int] = None):
        """Rotate xyz in place by a scalar angle about ``axis`` (default:
        the frame's yaw axis) or by a given 3x3 matrix
        (`base_points.py:77-115`). A matrix argument is applied as
        ``xyz @ rotation`` — the reference's (transposed) contract."""
        rotation = np.asarray(rotation, np.float32)
        if rotation.size == 1:
            if axis is None:
                axis = self.rotation_axis
            rot = _rotation_rhs(float(rotation), axis)
            self.tensor[:, :3] = self.tensor[:, :3] @ rot
        elif rotation.size == 9:
            self.tensor[:, :3] = self.tensor[:, :3] @ rotation.reshape(3, 3)
        else:
            raise NotImplementedError(
                f"rotation must be an angle or 3x3, got {rotation.shape}")

    def flip(self, bev_direction: str = "horizontal"):
        raise NotImplementedError

    def translate(self, trans_vector):
        """Translate xyz in place by (3,) or (N, 3)
        (`base_points.py:122-141`)."""
        t = np.asarray(trans_vector, np.float32)
        t = np.squeeze(t, 0) if t.ndim > 1 and t.shape[0] == 1 else t
        if t.ndim == 1:
            assert t.shape[0] == 3
        elif t.ndim == 2:
            assert t.shape == (len(self), 3)
        else:
            raise NotImplementedError(
                f"unsupported translation of shape {t.shape}")
        self.tensor[:, :3] += t

    def scale(self, scale_factor: float):
        self.tensor[:, :3] *= scale_factor

    def in_range_3d(self, point_range: Sequence[float]) -> np.ndarray:
        """Boolean mask of points strictly inside
        (x0, y0, z0, x1, y1, z1) (`base_points.py:143-165`)."""
        t = self.tensor
        return ((t[:, 0] > point_range[0]) & (t[:, 1] > point_range[1])
                & (t[:, 2] > point_range[2]) & (t[:, 0] < point_range[3])
                & (t[:, 1] < point_range[4]) & (t[:, 2] < point_range[5]))

    def in_range_bev(self, point_range: Sequence[float]) -> np.ndarray:
        raise NotImplementedError

    def _in_range_cols(self, point_range, c0: int, c1: int) -> np.ndarray:
        t = self.tensor
        return ((t[:, c0] > point_range[0]) & (t[:, c1] > point_range[1])
                & (t[:, c0] < point_range[2]) & (t[:, c1] < point_range[3]))

    def convert_to(self, dst: Union[Box3DMode, str],
                   rt_mat: Optional[np.ndarray] = None) -> "BasePoints":
        """Convert to another frame (`cam/depth/lidar_points.py
        convert_to`); extra channels pass through untouched."""
        if isinstance(dst, str):
            dst = Box3DMode[dst.upper().replace("CAMERA", "CAM")]
        assert self.mode is not None, "BasePoints has no frame"
        converted = convert_points_mode(self.tensor, self.mode, dst,
                                        rt_mat=rt_mat)
        cls = {Box3DMode.CAM: CameraPoints, Box3DMode.DEPTH: DepthPoints,
               Box3DMode.LIDAR: LiDARPoints}[dst]
        return cls(converted, points_dim=self.points_dim,
                   attribute_dims=self.attribute_dims)

    # -- structural ops ------------------------------------------------

    def __getitem__(self, item) -> "BasePoints":
        """Index rows (int / slice / bool or int array) or
        (rows, column-slice) like the reference (`base_points.py:207-271`),
        pruning ``attribute_dims`` entries whose columns are dropped."""
        cls = type(self)
        if isinstance(item, int):
            return cls(self.tensor[item].reshape(1, -1),
                       points_dim=self.points_dim,
                       attribute_dims=self.attribute_dims)
        if isinstance(item, tuple) and len(item) == 2:
            rows, cols = item
            if isinstance(cols, slice):
                cols = list(range(*cols.indices(self.tensor.shape[1])))
            cols = list(cols)
            p = self.tensor[rows][:, cols]
            keep = set(cols) & set(range(3, self.tensor.shape[1]))
            attribute_dims = None
            if self.attribute_dims is not None:
                attribute_dims = {}
                for key, dim in self.attribute_dims.items():
                    dims = [dim] if isinstance(dim, int) else list(dim)
                    kept = [d for d in dims if d in keep]
                    if len(kept) == 1:
                        attribute_dims[key] = kept[0]
                    elif kept:
                        attribute_dims[key] = kept
            return cls(p, points_dim=p.shape[1],
                       attribute_dims=attribute_dims)
        if isinstance(item, (slice, list, np.ndarray)):
            p = self.tensor[item]
            if p.ndim == 1:
                p = p.reshape(1, -1)
            return cls(p, points_dim=self.points_dim,
                       attribute_dims=self.attribute_dims)
        raise NotImplementedError(f"invalid slice {item}")

    @classmethod
    def cat(cls, points_list) -> "BasePoints":
        assert isinstance(points_list, (list, tuple))
        if not points_list:
            return cls(np.zeros((0, 3), np.float32))
        assert all(isinstance(p, cls) for p in points_list)
        first = points_list[0]
        return cls(np.concatenate([p.tensor for p in points_list], 0),
                   points_dim=first.tensor.shape[1],
                   attribute_dims=first.attribute_dims)

    def clone(self) -> "BasePoints":
        return type(self)(self.tensor.copy(),
                          points_dim=self.points_dim,
                          attribute_dims=self.attribute_dims)

    def new_point(self, data) -> "BasePoints":
        return type(self)(np.asarray(data, self.tensor.dtype),
                          points_dim=self.points_dim,
                          attribute_dims=self.attribute_dims)


class CameraPoints(BasePoints):
    """y-down camera frame: yaw about y; BEV is the xz plane
    (`cam_points.py`)."""

    rotation_axis = 1
    mode = Box3DMode.CAM

    def flip(self, bev_direction: str = "horizontal"):
        if bev_direction == "horizontal":
            self.tensor[:, 0] = -self.tensor[:, 0]
        elif bev_direction == "vertical":
            self.tensor[:, 2] = -self.tensor[:, 2]

    def in_range_bev(self, point_range):
        return self._in_range_cols(point_range, 0, 2)


class DepthPoints(BasePoints):
    """z-up depth/indoor frame: yaw about z; BEV is the xy plane,
    horizontal flip negates x (`depth_points.py`)."""

    rotation_axis = 2
    mode = Box3DMode.DEPTH

    def flip(self, bev_direction: str = "horizontal"):
        if bev_direction == "horizontal":
            self.tensor[:, 0] = -self.tensor[:, 0]
        elif bev_direction == "vertical":
            self.tensor[:, 1] = -self.tensor[:, 1]

    def in_range_bev(self, point_range):
        return self._in_range_cols(point_range, 0, 1)


class LiDARPoints(BasePoints):
    """z-up lidar frame: yaw about z; BEV is the xy plane, horizontal
    flip negates y (`lidar_points.py`)."""

    rotation_axis = 2
    mode = Box3DMode.LIDAR

    def flip(self, bev_direction: str = "horizontal"):
        if bev_direction == "horizontal":
            self.tensor[:, 1] = -self.tensor[:, 1]
        elif bev_direction == "vertical":
            self.tensor[:, 0] = -self.tensor[:, 0]

    def in_range_bev(self, point_range):
        return self._in_range_cols(point_range, 0, 1)


def get_points_type(points_type: str):
    """'CAMERA' | 'LIDAR' | 'DEPTH' -> class (reference
    `points/__init__.py:9-29`)."""
    try:
        return {"CAMERA": CameraPoints, "LIDAR": LiDARPoints,
                "DEPTH": DepthPoints}[points_type]
    except KeyError:
        raise ValueError(
            'Only "points_type" of "CAMERA", "LIDAR", or "DEPTH" are '
            f"supported, got {points_type}")
