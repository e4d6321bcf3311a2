from .nerfdet import NerfDet, SceneMeta
from .builder import build_model

__all__ = ["NerfDet", "SceneMeta", "build_model"]
