"""BISE integer sequence codec tests.

Mirrors the reference's implicit ISE contract (encode_ise/decode_ise,
reference: Source/astcenc_integer_sequence.cpp) — bit-exact streams and
roundtrip identity at every quant level.
"""

import numpy as np
import pytest

from astcenc_tpu.tables import ise


def test_bitcounts():
    # Spot values from the ASTC spec
    assert ise.sequence_bitcount(16, ise.QUANT_6) == 42  # 16 * 13/5 = 41.6
    assert ise.sequence_bitcount(8, ise.QUANT_256) == 64
    assert ise.sequence_bitcount(5, ise.QUANT_3) == 8
    assert ise.sequence_bitcount(3, ise.QUANT_5) == 7


def test_trit_quint_tables_roundtrip():
    dec_t, enc_t = ise.trit_tables()
    for combo in np.ndindex(3, 3, 3, 3, 3):
        T = enc_t[combo]
        assert tuple(dec_t[T][::-1]) == combo  # decode is t0..t4, combo t4..t0

    dec_q, enc_q = ise.quint_tables()
    for combo in np.ndindex(5, 5, 5):
        Q = enc_q[combo]
        assert tuple(dec_q[Q][::-1]) == combo


@pytest.mark.parametrize("quant", range(21))
def test_roundtrip_random(quant):
    rng = np.random.RandomState(quant * 17 + 1)
    levels = ise.QUANT_LEVELS[quant]
    for count in (1, 2, 5, 7, 12, 31, 64):
        vals = rng.randint(0, levels, size=(4, count))
        packed = ise.encode_ise(quant, vals)
        dec = ise.decode_ise(quant, count, packed)
        np.testing.assert_array_equal(dec, vals)


def test_bit_exact_vs_reference(oracle):
    nchecked = 0
    for vec in oracle["ise_vectors"]:
        q, count = vec["quant"], vec["count"]
        inp = np.array(vec["input"])
        packed = ise.encode_ise(q, inp[None, :])
        refp = np.array(vec["packed"], dtype=np.uint8)
        n = min(len(refp), packed.shape[-1])
        np.testing.assert_array_equal(packed[0][:n], refp[:n],
                                      err_msg=f"quant={q} count={count}")
        dec = ise.decode_ise(q, count, packed)
        np.testing.assert_array_equal(dec[0], inp)
        nchecked += 1
    assert nchecked > 300
