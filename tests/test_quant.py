"""Quantization transfer table tests vs the reference data tables."""

import numpy as np
import pytest

from astcenc_tpu.tables import ise, quant


@pytest.mark.parametrize("q", range(12))
def test_weight_tables(oracle, q):
    ref = oracle["weight_quant"][q]
    t = quant.weight_quant_tables(q)
    assert list(t["unquant"]) == ref["quant_to_unquant"]
    assert list(t["scramble"]) == ref["scramble_map"]
    assert list(t["unscramble_unquant"]) == ref["unscramble_and_unquant_map"]
    valid = set(int(v) for v in t["unquant"])
    for v in range(65):
        if v in valid:
            packed = ref["prev_next"][v]
            assert t["prev_next"][v, 0] == (packed & 0xFF)
            assert t["prev_next"][v, 1] == (packed >> 8)


@pytest.mark.parametrize("q", range(ise.QUANT_6, 21))
def test_color_tables(oracle, q):
    qi = q - ise.QUANT_6
    t = quant.color_quant_tables(q)
    ref512 = oracle["color_unquant_to_uquant"][qi]
    assert list(t["unquant_to_uquant_lo"]) == ref512[0::2]
    assert list(t["unquant_to_uquant_hi"]) == ref512[1::2]
    levels = ise.QUANT_LEVELS[q]
    assert (list(t["scrambled_pquant_to_uquant"])
            == oracle["color_scrambled_pquant_to_uquant"][qi][:levels])
    refp = oracle["color_uquant_to_scrambled_pquant"][qi]
    for v in t["scrambled_pquant_to_uquant"]:
        assert t["uquant_to_scrambled_pquant"][v] == refp[v]


def test_quant_mode_table(oracle):
    np.testing.assert_array_equal(quant.quant_mode_table(),
                                  np.array(oracle["quant_mode_table"]))


def test_encoder_weight_lut_is_value_ordered():
    """Regression: the encoder's weight LUT must be quant_to_unquant
    (value-ascending), not symbol order. Symbol order silently breaks only
    the trit/quint+bits levels (Q6/Q10/Q12/...), which ranked those modes
    out of every candidate list (reference quant_to_unquant ordering:
    astcenc_weight_quant_xfer_tables.cpp)."""
    from astcenc_tpu.codec.trial import build_encoder_tables  # noqa: F401
    from astcenc_tpu.tables.bsd import build_bsd

    et = build_encoder_tables(build_bsd(6, 6, 1))
    for q in range(12):
        levels = ise.QUANT_LEVELS[q]
        row = et.weight_quant_unquant[q, :levels]
        assert row[0] == 0 and row[-1] == 64
        assert np.all(np.diff(row) > 0), f"quant level {q} not ascending"
    # Spot value from the reference table: QUANT_6 = {0,12,25,39,52,64}
    np.testing.assert_array_equal(et.weight_quant_unquant[4, :6],
                                  [0, 12, 25, 39, 52, 64])
