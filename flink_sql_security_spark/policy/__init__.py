"""Policy store: row-filter / data-mask policies + mask-type registry."""

from .manager import PolicyManager  # noqa: F401
from .models import (  # noqa: F401
    ColumnEntity, DataMaskPolicy, DataMaskType, RowFilterPolicy, TableEntity,
)
