"""Property tests for the predicate layer: zone-map checks may NEVER
false-negative (prune a container that holds a match), the DNF mask must
equal the OR of branch masks, and the prefix interval must be exact."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_converter_ray.zonemap import (
    _prefix_upper,
    column_stats,
    dnf_mask,
    predicate_mask,
    record_may_match,
)

_strings = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=12
)
_ints = st.integers(min_value=-(10**6), max_value=10**6)


@settings(max_examples=150, deadline=None)
@given(
    vals=st.lists(st.one_of(st.none(), _ints), min_size=1, max_size=60),
    lit=_ints,
    op=st.sampled_from(["==", "!=", "<", "<=", ">", ">=", "between", "in"]),
    span=st.integers(min_value=0, max_value=50),
)
def test_zone_map_never_false_negative_ints(vals, lit, op, span):
    t = pa.table({"x": pa.array(vals, type=pa.int64())})
    stats = column_stats(t)
    if op == "between":
        clause = ("x", op, (lit, lit + span))
    elif op == "in":
        clause = ("x", op, [lit, lit + span])
    else:
        clause = ("x", op, lit)
    mask = predicate_mask(t, [clause])
    has_match = bool(pc.any(mask).as_py() or False)
    may = record_may_match(stats, t.num_rows, [clause])
    if has_match:
        assert may  # pruning a matching container would be a wrong result


@settings(max_examples=150, deadline=None)
@given(
    vals=st.lists(_strings, min_size=1, max_size=40),
    prefix=_strings,
)
def test_prefix_zone_map_and_mask_exact(vals, prefix):
    t = pa.table({"s": pa.array(vals, type=pa.string())})
    # dict-codec hint so string bounds are recorded
    stats = column_stats(t, codecs={"s": "dict"})
    clause = ("s", "prefix", prefix)
    mask = predicate_mask(t, [clause]).to_pylist()
    want = [v.startswith(prefix) for v in vals]
    assert mask == want
    if any(want):
        assert record_may_match(stats, t.num_rows, [clause])


@settings(max_examples=200, deadline=None)
@given(p=_strings.filter(lambda s: len(s) > 0), s=_strings)
def test_prefix_upper_is_exact_interval(p, s):
    """s has prefix p  <=>  p <= s < _prefix_upper(p)."""
    up = _prefix_upper(p)
    in_interval = s >= p and (up is None or s < up)
    assert s.startswith(p) == in_interval


@settings(max_examples=100, deadline=None)
@given(
    vals=st.lists(st.one_of(st.none(), _ints), min_size=1, max_size=60),
    a=_ints,
    b=_ints,
    w=st.integers(min_value=0, max_value=100),
)
def test_dnf_mask_is_or_of_branches(vals, a, b, w):
    t = pa.table({"x": pa.array(vals, type=pa.int64())})
    br1 = [("x", "between", (a, a + w))]
    br2 = [("x", ">=", b)]
    m = dnf_mask(t, [br1, br2]).to_pylist()
    m1 = predicate_mask(t, br1).to_pylist()
    m2 = predicate_mask(t, br2).to_pylist()
    assert m == [x or y for x, y in zip(m1, m2)]
