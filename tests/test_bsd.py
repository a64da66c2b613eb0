"""Block size descriptor construction tests vs the reference.

Validates block-mode filtering/ordering, decimation stencils, partition
tables, coverage bitmaps and kmeans texel selection index-for-index against
init_block_size_descriptor (reference: Source/astcenc_block_sizes.cpp,
Source/astcenc_partition_tables.cpp).
"""

import numpy as np
import pytest

from astcenc_tpu.tables import bsd as bsdmod


def _cases(oracle):
    return [(tuple(r["dim"]), bool(r["can_omit"]), r["cutoff"],
             r["part_cutoff"]) for r in oracle["bsds"]]


def _find(oracle, dim, can_omit, cutoff, part_cutoff):
    for r in oracle["bsds"]:
        if (tuple(r["dim"]) == dim and bool(r["can_omit"]) == can_omit
                and r["cutoff"] == cutoff and r["part_cutoff"] == part_cutoff):
            return r
    raise KeyError


def test_all_bsds(oracle):
    for dim, can_omit, cutoff, part_cutoff in _cases(oracle):
        ref = _find(oracle, dim, can_omit, cutoff, part_cutoff)
        b = bsdmod.build_bsd(dim[0], dim[1], dim[2], can_omit, cutoff,
                             part_cutoff)

        assert [b.block_mode_count_1plane_always,
                b.block_mode_count_1plane_selected,
                b.block_mode_count_1plane_2plane_selected,
                b.block_mode_count_all] == ref["block_mode_counts"]

        refbm = np.array(ref["block_modes"])
        mine = np.stack([b.bm_mode_index, b.bm_decimation_mode,
                         b.bm_quant_mode, b.bm_weight_bits,
                         b.bm_is_dual_plane.astype(np.int32)], 1)
        np.testing.assert_array_equal(refbm, mine)

        assert b.decimation_mode_count_all == ref["decimation_mode_counts"][2]
        T = b.texel_count
        for i, dmref in enumerate(ref["decimation_modes"]):
            assert list(b.dm_weight_dims[i]) == dmref["wdim"]
            assert [b.dm_maxprec_1plane[i],
                    b.dm_maxprec_2planes[i]] == dmref["maxprec"]
            assert [b.dm_refprec_1plane[i],
                    b.dm_refprec_2planes[i]] == dmref["refprec"]
        for i, dtref in enumerate(ref["decimation_tables"]):
            np.testing.assert_array_equal(
                b.dec_texel_weights[i, :, :T],
                np.array(dtref["texel_weights_tr"]))
            np.testing.assert_array_equal(
                b.dec_texel_contribs_int[i, :, :T],
                np.array(dtref["texel_weight_contribs_int_tr"]))
            assert (b.dec_dense[i, :T].sum(1) == 16).all()

        for pcidx, pc in enumerate((2, 3, 4)):
            p = b.partitionings[pc]
            assert p["count_selected"] == ref["partitioning_count_selected"][pc - 1]
            assert p["count_all"] == ref["partitioning_count_all"][pc - 1]
            np.testing.assert_array_equal(
                p["packed_index"],
                np.array(ref["partitioning_packed_index"][pcidx]))
            for i, pref in enumerate(ref["partitionings"][pcidx]):
                assert p["seed"][i] == pref["seed"]
                np.testing.assert_array_equal(
                    p["partition_of_texel"][i],
                    np.array(pref["partition_of_texel"]))

        assert list(b.kmeans_texels) == ref["kmeans_texels"][:len(b.kmeans_texels)]
        cov2 = b.partitionings[2]["coverage"]
        for i, cref in enumerate(ref["coverage_bitmaps_2"]):
            mine0 = sum(1 << j for j in range(64) if cov2[i, 0, j])
            mine1 = sum(1 << j for j in range(64) if cov2[i, 1, j])
            assert [mine0, mine1] == cref


def test_percentiles(oracle):
    from astcenc_tpu.tables import percentile
    for entry in oracle["percentiles"]:
        x, y = entry["dim"]
        mine = percentile.percentile_table_2d(x, y)
        np.testing.assert_allclose(mine, np.array(entry["values"],
                                                  dtype=np.float32))


@pytest.mark.parametrize("dim", [(4, 4, 1), (6, 6, 1), (3, 3, 3)])
def test_bsd_invariants(dim):
    b = bsdmod.build_bsd(*dim)
    # Round-trip packed index
    for packed, raw in enumerate(b.bm_mode_index):
        assert b.block_mode_packed_index[raw] == packed
    # Dense decimation rows always sum to 16 (fixed-point weight sum)
    assert (b.dec_dense[:, :b.texel_count].sum(-1) == 16).all()
