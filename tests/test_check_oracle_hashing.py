"""Pin the oracle-gate replica's value normalization.

Round 1's blind spot: the replica compared raw Python objects, so
Decimal('1.40') == Decimal('1.4') passed locally while the driver —
which hashes STRINGIFIED values — failed. These tests keep
tools/check_oracle.py faithful to the driver's comparison."""

from __future__ import annotations

import os
import sys
from decimal import Decimal

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check_oracle import _hash_str, norm_rows  # noqa: E402


def test_decimal_scale_drift_is_a_mismatch():
    # numerically equal, stringwise different — the driver fails these
    assert _hash_str(Decimal("1.40")) != _hash_str(Decimal("1.4"))
    # and a float 1.4 is its own representation again
    assert _hash_str(1.4) == "1.4" and _hash_str(Decimal("1.4")) == "1.4"


def test_float_uses_repr_roundtrip():
    # repr keeps the shortest round-trip form, matching str() in py3
    assert _hash_str(0.1 + 0.2) == "0.30000000000000004"


def test_null_is_distinct_from_empty_and_none_string():
    assert _hash_str(None) not in {_hash_str(""), _hash_str("None")}


def test_norm_rows_sorts_columns_by_name_then_rows():
    # driver compares order-insensitively with columns sorted by name
    a = norm_rows(["b", "a"], [(1, "x"), (0, "y")])
    b = norm_rows(["a", "b"], [("y", 0), ("x", 1)])
    assert a == b
