"""Merged query registry (relational + training-data/ML entries)."""

from __future__ import annotations

from .queries import _BASE_REGISTRY, QuerySpec
from .queries_ml import REGISTRY_ML

REGISTRY: dict[str, QuerySpec] = {**_BASE_REGISTRY, **REGISTRY_ML}
