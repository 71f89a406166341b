"""Scalar expression library (SURVEY.md §2.10)."""

from .ids import deterministic_id  # noqa: F401
from .levels import LEVEL_ALIASES, normalize_level  # noqa: F401
from .timestamps import multi_format_ts  # noqa: F401
