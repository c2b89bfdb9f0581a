"""Policy and mask-type data model.

Parity targets: ``policy/RowFilterPolicy.java:30-41``,
``policy/DataMaskPolicy.java:30-43``, ``enums/DataMaskType.java:30-43`` in the
reference. Policies are plain frozen dataclasses; the ``condition`` of a row
filter is a Spark-SQL boolean expression string, the ``condition`` of a data
mask names a mask type (e.g. ``MASK_SHOW_FIRST_4``) or, for CUSTOM, carries an
arbitrary ``{col}`` SQL template via ``custom_transformer``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class RowFilterPolicy:
    username: str
    table_name: str
    condition: str
    catalog_name: Optional[str] = None
    database: Optional[str] = None

    def table_path(self) -> list[str]:
        parts = []
        if self.catalog_name:
            parts.append(self.catalog_name)
        if self.database:
            parts.append(self.database)
        parts.append(self.table_name)
        return parts


@dataclass(frozen=True)
class DataMaskPolicy:
    username: str
    table_name: str
    column_name: str
    condition: str  # mask type name, e.g. "MASK_SHOW_FIRST_4"
    catalog_name: Optional[str] = None
    database: Optional[str] = None
    custom_transformer: Optional[str] = None  # used when condition == "CUSTOM"

    def table_path(self) -> list[str]:
        parts = []
        if self.catalog_name:
            parts.append(self.catalog_name)
        if self.database:
            parts.append(self.database)
        parts.append(self.table_name)
        return parts


@dataclass(frozen=True)
class DataMaskType:
    item_id: int
    name: str
    label: str
    description: str
    transformer: Optional[str] = None
    data_mask_options: dict = field(default_factory=dict, hash=False, compare=False)


@dataclass(frozen=True)
class ColumnEntity:
    """Column name + DDL type string, ``NOT NULL`` stripped
    (model/ColumnEntity.java:32-37; SecurityContext.java:276-292)."""
    column_name: str
    column_type: str


@dataclass(frozen=True)
class TableEntity:
    """Ordered column list for a table (model/TableEntity.java:36-41)."""
    table_path: tuple[str, ...]
    columns: tuple[ColumnEntity, ...]
