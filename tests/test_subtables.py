"""Subtable strategy tests (reference: src/subtables/*.rs test modules).

The materialization/MLE parity tests mirror the reference's
`materialization_mle_parity_test!` macro (src/subtables/test.rs:15-40):
table[i][k] must equal evaluate_subtable_mle(i, bits(k)) over the whole
hypercube.
"""

import numpy as np
import pytest

import lasso_tpu.subtables.bitwise  # noqa: F401
import lasso_tpu.subtables.lt  # noqa: F401
import lasso_tpu.subtables.range_check  # noqa: F401
from lasso_tpu.field.host import Fr
from lasso_tpu.subtables.base import HostOps, get_strategy, list_strategies


def _bits(k, n):
    """index -> field bit vector, MSB first (reference: utils/mod.rs:33-46)."""
    return [(k >> (n - 1 - i)) & 1 for i in range(n)]


@pytest.mark.parametrize("name,kwargs", [
    ("and", {}), ("or", {}), ("xor", {}), ("lt", {}),
    ("range_check", {"log_r": 10}),
])
def test_materialization_mle_parity(name, kwargs):
    m = 64
    strategy = get_strategy(name, 2, m, **kwargs)
    tables = strategy.materialize_subtables()
    log_m = 6
    for i in range(tables.shape[0]):
        for k in range(m):
            got = strategy.evaluate_subtable_mle(i, _bits(k, log_m))
            assert got == int(tables[i][k]) % Fr.p, f"{name} subtable {i} idx {k}"


def test_and_materialization_hardcoded():
    # M=16: operands are 2-bit halves (reference: and.rs:70-92)
    strategy = get_strategy("and", 2, 16)
    t = strategy.materialize_subtables()[0]
    assert t[0b00_00] == 0b00
    assert t[0b11_11] == 0b11
    assert t[0b11_01] == 0b01
    assert t[0b10_11] == 0b10


def test_or_xor_materialization_hardcoded():
    t_or = get_strategy("or", 2, 16).materialize_subtables()[0]
    t_xor = get_strategy("xor", 2, 16).materialize_subtables()[0]
    assert t_or[0b10_01] == 0b11 and t_xor[0b10_01] == 0b11
    assert t_or[0b11_01] == 0b11 and t_xor[0b11_01] == 0b10


def test_lt_materialization_hardcoded():
    lt, eq = get_strategy("lt", 2, 16).materialize_subtables()
    assert lt[0b01_10] == 1 and lt[0b10_01] == 0 and lt[0b01_01] == 0
    assert eq[0b01_01] == 1 and eq[0b01_10] == 0


def test_combine_lookups_and():
    # g = base-2^(logM/2) recomposition (reference: and.rs:94-110)
    strategy = get_strategy("and", 3, 1 << 16)
    vals = [3, 5, 7]
    expect = (3 + 5 * (1 << 8) + 7 * (1 << 16)) % Fr.p
    assert strategy.combine_lookups(vals, HostOps) == expect


def test_combine_lookups_lt():
    # g = sum LT[i] * prod_{j<i} EQ[j] (reference: lt.rs:85-111)
    strategy = get_strategy("lt", 3, 16)
    lt0, eq0, lt1, eq1, lt2, eq2 = 2, 3, 5, 7, 11, 13
    expect = (lt0 + lt1 * eq0 + lt2 * eq0 * eq1) % Fr.p
    got = strategy.combine_lookups([lt0, eq0, lt1, eq1, lt2, eq2], HostOps)
    assert got == expect


def test_range_check_memory_maps():
    # bit-budget subtable selection (reference: range_check.rs:62-73)
    s = get_strategy("range_check", 3, 1 << 16, log_r=40)
    assert [s.memory_to_subtable_index(i) for i in range(3)] == [0, 0, 1]
    assert [s.memory_to_dimension_index(i) for i in range(3)] == [0, 1, 2]
    s2 = get_strategy("range_check", 4, 1 << 16, log_r=40)
    assert [s2.memory_to_subtable_index(i) for i in range(4)] == [0, 0, 1, 2]


def test_registry():
    names = list_strategies()
    for n in ("and", "or", "xor", "lt", "range_check"):
        assert n in names
