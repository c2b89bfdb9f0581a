"""Rewrite operators (row filter, data mask) and data-pipeline operators."""

from .data_mask import DataMaskVisitor  # noqa: F401
from .row_filter import RowFilterVisitor, qualify_condition  # noqa: F401
