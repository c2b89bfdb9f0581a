"""In-memory policy store with first-match-wins lookup.

Parity target: ``PolicyManager.java:49-113`` — linear scan over an insertion-
ordered list, first matching policy wins, plus the mask-type registry loaded
from the packaged ``mask_types.json`` (same 8 entries and itemIds as the
reference's ``resources/data_mask_types.json:1-63``).

Matching deviation (documented): the reference compares exact 3-part paths
because Calcite validation force-expands every table ref to
``catalog.database.table``. Our qualify pass keeps paths as written (Spark temp
views have no catalog.database home), so a policy matches when its trailing
path components equal the written table path and unset policy fields act as
wildcards. All reference golden cases behave identically.
"""

from __future__ import annotations

import json
from importlib import resources
from typing import Optional

from .models import DataMaskPolicy, DataMaskType, RowFilterPolicy


def _load_mask_types() -> list[DataMaskType]:
    raw = json.loads(
        resources.files("flink_sql_security_spark.policy")
        .joinpath("mask_types.json")
        .read_text()
    )
    return [
        DataMaskType(
            item_id=e["itemId"],
            name=e["name"],
            label=e["label"],
            description=e["description"],
            transformer=e.get("transformer"),
            data_mask_options=e.get("dataMaskOptions", {}),
        )
        for e in raw
    ]


def _norm(s: Optional[str]) -> Optional[str]:
    return s.lower() if s is not None else None


class PolicyManager:
    def __init__(self) -> None:
        self._row_filter_policies: list[RowFilterPolicy] = []
        self._data_mask_policies: list[DataMaskPolicy] = []
        self._mask_types: list[DataMaskType] = _load_mask_types()

    # -- policy CRUD (PolicyManager.java:99-113) ---------------------------
    def add_policy(self, policy) -> None:
        if isinstance(policy, RowFilterPolicy):
            self._row_filter_policies.append(policy)
        elif isinstance(policy, DataMaskPolicy):
            self._data_mask_policies.append(policy)
        else:
            raise TypeError(f"unsupported policy type: {type(policy).__name__}")

    def remove_policy(self, policy) -> bool:
        for lst in (self._row_filter_policies, self._data_mask_policies):
            if policy in lst:
                lst.remove(policy)
                return True
        return False

    @property
    def row_filter_policies(self) -> list[RowFilterPolicy]:
        return list(self._row_filter_policies)

    @property
    def data_mask_policies(self) -> list[DataMaskPolicy]:
        return list(self._data_mask_policies)

    # -- matching ----------------------------------------------------------
    @staticmethod
    def _table_matches(policy_path: list[str], written: list[str]) -> bool:
        """Policy path must be a suffix-compatible match of the written ref."""
        p = [_norm(x) for x in policy_path]
        w = [_norm(x) for x in written]
        if p[-1] != w[-1]:
            return False
        # compare overlapping qualifiers from the right
        for pq, wq in zip(reversed(p[:-1]), reversed(w[:-1])):
            if pq != wq:
                return False
        return True

    def get_row_filter_condition(
        self, username: str, table_parts: list[str]
    ) -> Optional[str]:
        """First matching row-filter condition (PolicyManager.java:61-72)."""
        for p in self._row_filter_policies:
            if p.username == username and self._table_matches(
                p.table_path(), table_parts
            ):
                return p.condition
        return None

    def get_data_mask_policy(
        self, username: str, table_parts: list[str], column_name: str
    ) -> Optional[DataMaskPolicy]:
        """First matching mask policy for a column (PolicyManager.java:74-86)."""
        for p in self._data_mask_policies:
            if (
                p.username == username
                and _norm(p.column_name) == _norm(column_name)
                and self._table_matches(p.table_path(), table_parts)
            ):
                return p
        return None

    def get_table_mask_policies(
        self, username: str, table_parts: list[str]
    ) -> dict[str, DataMaskPolicy]:
        """column (lower) → first matching policy, for one table ref."""
        out: dict[str, DataMaskPolicy] = {}
        for p in self._data_mask_policies:
            if p.username == username and self._table_matches(
                p.table_path(), table_parts
            ):
                key = _norm(p.column_name) or ""
                if key not in out:  # first match wins
                    out[key] = p
        return out

    # -- mask type registry (PolicyManager.java:88-97) ---------------------
    @property
    def mask_types(self) -> list[DataMaskType]:
        return list(self._mask_types)

    def get_data_mask_type(self, name: str) -> DataMaskType:
        for t in self._mask_types:
            if t.name == name:
                return t
        raise KeyError(f"unknown data mask type: {name}")


def load_policies_json(manager: "PolicyManager", path: str) -> int:
    """Load row-filter / data-mask policies from a JSON file into
    ``manager`` (append, preserving file order — first-match-wins applies
    across existing + loaded policies in insertion order).

    File shape (both keys optional)::

        {
          "row_filters": [{"username": ..., "table_name": ...,
                           "condition": ..., "catalog_name"?, "database"?}],
          "data_masks":  [{"username": ..., "table_name": ...,
                           "column_name": ..., "condition": ...,
                           "catalog_name"?, "database"?,
                           "custom_transformer"?}]
        }

    The operational counterpart of the reference's JSON-resource mask
    registry: policy sets become reviewable config artifacts instead of
    imperative ``add_policy`` call sites. Returns the number loaded;
    unknown keys in an entry raise (typo protection — a silently dropped
    security policy is an access-control hole).
    """
    with open(path) as f:
        raw = json.load(f)
    unknown_top = set(raw) - {"row_filters", "data_masks"}
    if unknown_top:
        raise ValueError(f"unknown policy sections: {sorted(unknown_top)}")
    n = 0
    for e in raw.get("row_filters", []):
        manager.add_policy(RowFilterPolicy(**e))
        n += 1
    for e in raw.get("data_masks", []):
        manager.add_policy(DataMaskPolicy(**e))
        n += 1
    return n
