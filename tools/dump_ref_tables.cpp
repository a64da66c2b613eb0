// Test-oracle tool: dumps the reference astcenc's derived data tables to JSON
// so the TPU framework's independently *generated* tables can be validated
// bit-for-bit in tests. This tool links against an out-of-tree build of the
// read-only reference mount (/root/reference); it is NOT part of the framework
// runtime and the framework never links or includes reference code.
//
// Build (see tools/build_ref_dump.sh):
//   g++ -O2 -march=native -std=c++17 -ffp-contract=off \
//       -I $REF/Source dump_ref_tables.cpp $BUILD/Source/libastcenc-native-static.a \
//       -o dump_ref_tables -pthread
//
// Usage: dump_ref_tables <out.json>

#include "astcenc_internal.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <vector>

static FILE* out = nullptr;

static void emit_u8_array(const char* name, const uint8_t* data, int n, bool comma = true)
{
    fprintf(out, "\"%s\":[", name);
    for (int i = 0; i < n; i++)
    {
        fprintf(out, "%u%s", data[i], i + 1 < n ? "," : "");
    }
    fprintf(out, "]%s", comma ? "," : "");
}

static void emit_i32_array(const char* name, const int* data, int n, bool comma = true)
{
    fprintf(out, "\"%s\":[", name);
    for (int i = 0; i < n; i++)
    {
        fprintf(out, "%d%s", data[i], i + 1 < n ? "," : "");
    }
    fprintf(out, "]%s", comma ? "," : "");
}

static void emit_f32_array(const char* name, const float* data, int n, bool comma = true)
{
    fprintf(out, "\"%s\":[", name);
    for (int i = 0; i < n; i++)
    {
        fprintf(out, "%.9g%s", data[i], i + 1 < n ? "," : "");
    }
    fprintf(out, "]%s", comma ? "," : "");
}

static void dump_color_quant_tables()
{
    fprintf(out, "\"color_unquant_to_uquant\":[");
    for (int q = 0; q < 17; q++)
    {
        fprintf(out, "[");
        for (int i = 0; i < 512; i++)
        {
            fprintf(out, "%u%s", color_unquant_to_uquant_tables[q][i], i < 511 ? "," : "");
        }
        fprintf(out, "]%s", q < 16 ? "," : "");
    }
    fprintf(out, "],");

    fprintf(out, "\"color_uquant_to_scrambled_pquant\":[");
    for (int q = 0; q < 17; q++)
    {
        fprintf(out, "[");
        for (int i = 0; i < 256; i++)
        {
            fprintf(out, "%u%s", color_uquant_to_scrambled_pquant_tables[q][i], i < 255 ? "," : "");
        }
        fprintf(out, "]%s", q < 16 ? "," : "");
    }
    fprintf(out, "],");

    fprintf(out, "\"color_scrambled_pquant_to_uquant\":[");
    for (int q = 0; q < 17; q++)
    {
        fprintf(out, "[");
        for (int i = 0; i < 256; i++)
        {
            fprintf(out, "%u%s", color_scrambled_pquant_to_uquant_tables[q][i], i < 255 ? "," : "");
        }
        fprintf(out, "]%s", q < 16 ? "," : "");
    }
    fprintf(out, "],");

    fprintf(out, "\"quant_mode_table\":[");
    for (int i = 0; i < 10; i++)
    {
        fprintf(out, "[");
        for (int j = 0; j < 128; j++)
        {
            fprintf(out, "%d%s", quant_mode_table[i][j], j < 127 ? "," : "");
        }
        fprintf(out, "]%s", i < 9 ? "," : "");
    }
    fprintf(out, "],");
}

static void dump_weight_quant_tables()
{
    fprintf(out, "\"weight_quant\":[");
    for (int q = 0; q < 12; q++)
    {
        const auto& t = quant_and_xfer_tables[q];
        int levels = get_quant_level(static_cast<quant_method>(q));
        fprintf(out, "{");
        emit_u8_array("quant_to_unquant", t.quant_to_unquant, levels);
        emit_u8_array("scramble_map", t.scramble_map, levels);
        emit_u8_array("unscramble_and_unquant_map", t.unscramble_and_unquant_map, levels);
        fprintf(out, "\"prev_next\":[");
        for (int i = 0; i < 65; i++)
        {
            fprintf(out, "%u%s", t.prev_next_values[i], i < 64 ? "," : "");
        }
        fprintf(out, "]}%s", q < 11 ? "," : "");
    }
    fprintf(out, "],");
}

static void dump_ise_vectors()
{
    // Encode fixed pseudo-random sequences at every quant level / count and dump
    // the packed bitstreams, for bit-exact validation of the Python ISE codec.
    static const int counts[] = {1, 2, 3, 4, 5, 6, 7, 8, 10, 15, 18, 24, 31, 47, 64};
    fprintf(out, "\"ise_vectors\":[");
    bool first = true;
    for (int q = 0; q <= QUANT_256; q++)
    {
        int levels = get_quant_level(static_cast<quant_method>(q));
        for (int ci = 0; ci < (int)(sizeof(counts) / sizeof(counts[0])); ci++)
        {
            int count = counts[ci];
            uint8_t input[64];
            for (int i = 0; i < count; i++)
            {
                input[i] = static_cast<uint8_t>((i * 7 + 3 + q * 13) % levels);
            }
            uint8_t packed[96];
            memset(packed, 0, sizeof(packed));
            encode_ise(static_cast<quant_method>(q), count, input, packed, 0);

            int nbits = get_ise_sequence_bitcount(count, static_cast<quant_method>(q));

            if (!first) fprintf(out, ",");
            first = false;
            fprintf(out, "{\"quant\":%d,\"count\":%d,\"bits\":%d,", q, count, nbits);
            emit_u8_array("input", input, count);
            emit_u8_array("packed", packed, (nbits + 7) / 8, false);
            fprintf(out, "}");
        }
    }
    fprintf(out, "],");
}

static void dump_percentiles()
{
    static const int sizes[][2] = {
        {4, 4}, {5, 4}, {5, 5}, {6, 5}, {6, 6}, {8, 5}, {8, 6}, {8, 8},
        {10, 5}, {10, 6}, {10, 8}, {10, 10}, {12, 10}, {12, 12},
    };
    fprintf(out, "\"percentiles\":[");
    for (int s = 0; s < (int)(sizeof(sizes) / sizeof(sizes[0])); s++)
    {
        const float* tbl = get_2d_percentile_table(sizes[s][0], sizes[s][1]);
        fprintf(out, "{\"dim\":[%d,%d],", sizes[s][0], sizes[s][1]);
        emit_f32_array("values", tbl, WEIGHTS_MAX_BLOCK_MODES, false);
        fprintf(out, "}%s", s + 1 < (int)(sizeof(sizes) / sizeof(sizes[0])) ? "," : "");
        delete[] tbl;
    }
    fprintf(out, "],");
}

static void dump_bsd(int x, int y, int z, bool can_omit, float cutoff, int part_cutoff, bool comma)
{
    auto bsd = std::make_unique<block_size_descriptor>();
    init_block_size_descriptor(x, y, z, can_omit, part_cutoff, cutoff, *bsd);

    fprintf(out, "{\"dim\":[%d,%d,%d],\"can_omit\":%d,\"cutoff\":%.9g,\"part_cutoff\":%d,",
            x, y, z, can_omit ? 1 : 0, cutoff, part_cutoff);
    fprintf(out, "\"texel_count\":%u,", bsd->texel_count);
    fprintf(out, "\"block_mode_counts\":[%u,%u,%u,%u],",
            bsd->block_mode_count_1plane_always,
            bsd->block_mode_count_1plane_selected,
            bsd->block_mode_count_1plane_2plane_selected,
            bsd->block_mode_count_all);
    fprintf(out, "\"decimation_mode_counts\":[%u,%u,%u],",
            bsd->decimation_mode_count_always,
            bsd->decimation_mode_count_selected,
            bsd->decimation_mode_count_all);

    // Block modes (packed order)
    fprintf(out, "\"block_modes\":[");
    for (unsigned int i = 0; i < bsd->block_mode_count_all; i++)
    {
        const auto& bm = bsd->block_modes[i];
        fprintf(out, "[%u,%u,%u,%u,%u]%s", bm.mode_index, bm.decimation_mode, bm.quant_mode,
                bm.weight_bits, bm.is_dual_plane, i + 1 < bsd->block_mode_count_all ? "," : "");
    }
    fprintf(out, "],");

    // Decimation modes + tables
    fprintf(out, "\"decimation_modes\":[");
    for (unsigned int i = 0; i < bsd->decimation_mode_count_all; i++)
    {
        const auto& dm = bsd->decimation_modes[i];
        const auto& di = bsd->decimation_tables[i];
        fprintf(out, "{\"wdim\":[%u,%u,%u],\"weight_count\":%u,\"maxprec\":[%d,%d],\"refprec\":[%u,%u],",
                di.weight_x, di.weight_y, di.weight_z, di.weight_count,
                dm.maxprec_1plane, dm.maxprec_2planes, dm.refprec_1plane, dm.refprec_2planes);
        int tc = di.texel_count;
        emit_u8_array("texel_weight_count", di.texel_weight_count, tc, false);
        fprintf(out, "}%s", i + 1 < bsd->decimation_mode_count_all ? "," : "");
    }
    fprintf(out, "],");

    // Decimation texel/weight tables, emitted flat per mode for easy numpy reshape
    fprintf(out, "\"decimation_tables\":[");
    for (unsigned int i = 0; i < bsd->decimation_mode_count_all; i++)
    {
        const auto& di = bsd->decimation_tables[i];
        int tc = di.texel_count;
        int wc = di.weight_count;
        fprintf(out, "{");
        fprintf(out, "\"texel_weights_tr\":[");
        for (int j = 0; j < 4; j++)
        {
            fprintf(out, "[");
            for (int t = 0; t < tc; t++)
            {
                fprintf(out, "%u%s", di.texel_weights_tr[j][t], t + 1 < tc ? "," : "");
            }
            fprintf(out, "]%s", j < 3 ? "," : "");
        }
        fprintf(out, "],");
        fprintf(out, "\"texel_weight_contribs_int_tr\":[");
        for (int j = 0; j < 4; j++)
        {
            fprintf(out, "[");
            for (int t = 0; t < tc; t++)
            {
                fprintf(out, "%u%s", di.texel_weight_contribs_int_tr[j][t], t + 1 < tc ? "," : "");
            }
            fprintf(out, "]%s", j < 3 ? "," : "");
        }
        fprintf(out, "],");
        fprintf(out, "\"weight_texel_count\":[");
        for (int w = 0; w < wc; w++)
        {
            fprintf(out, "%u%s", di.weight_texel_count[w], w + 1 < wc ? "," : "");
        }
        fprintf(out, "]}%s", i + 1 < bsd->decimation_mode_count_all ? "," : "");
    }
    fprintf(out, "],");

    // Partitionings: for each count emit packed index map and per-entry texel map
    fprintf(out, "\"partitioning_count_selected\":[%u,%u,%u,%u],",
            bsd->partitioning_count_selected[0], bsd->partitioning_count_selected[1],
            bsd->partitioning_count_selected[2], bsd->partitioning_count_selected[3]);
    fprintf(out, "\"partitioning_count_all\":[%u,%u,%u,%u],",
            bsd->partitioning_count_all[0], bsd->partitioning_count_all[1],
            bsd->partitioning_count_all[2], bsd->partitioning_count_all[3]);

    fprintf(out, "\"partitioning_packed_index\":[");
    for (int pc = 0; pc < 3; pc++)
    {
        fprintf(out, "[");
        for (int i = 0; i < (int)BLOCK_MAX_PARTITIONINGS; i++)
        {
            fprintf(out, "%u%s", bsd->partitioning_packed_index[pc][i],
                    i + 1 < (int)BLOCK_MAX_PARTITIONINGS ? "," : "");
        }
        fprintf(out, "]%s", pc < 2 ? "," : "");
    }
    fprintf(out, "],");

    fprintf(out, "\"partitionings\":[");
    for (int pc = 2; pc <= 4; pc++)
    {
        const partition_info* tab = bsd->get_partition_table(pc);
        unsigned int n = bsd->partitioning_count_all[pc - 1];
        fprintf(out, "[");
        for (unsigned int i = 0; i < n; i++)
        {
            const auto& pi = tab[i];
            fprintf(out, "{\"seed\":%u,\"pcount\":%u,", pi.partition_index, pi.partition_count);
            emit_u8_array("texel_counts", pi.partition_texel_count, 4);
            emit_u8_array("partition_of_texel", pi.partition_of_texel, bsd->texel_count, false);
            fprintf(out, "}%s", i + 1 < n ? "," : "");
        }
        fprintf(out, "]%s", pc < 4 ? "," : "");
    }
    fprintf(out, "],");

    emit_u8_array("kmeans_texels", bsd->kmeans_texels, BLOCK_MAX_KMEANS_TEXELS);

    fprintf(out, "\"coverage_bitmaps_2\":[");
    for (unsigned int i = 0; i < bsd->partitioning_count_selected[1]; i++)
    {
        fprintf(out, "[%llu,%llu]%s",
                (unsigned long long)bsd->coverage_bitmaps_2[i][0],
                (unsigned long long)bsd->coverage_bitmaps_2[i][1],
                i + 1 < bsd->partitioning_count_selected[1] ? "," : "");
    }
    fprintf(out, "]");

    fprintf(out, "}%s", comma ? "," : "");
}

int main(int argc, char** argv)
{
    if (argc < 2)
    {
        fprintf(stderr, "usage: %s <out.json> [mode]\n", argv[0]);
        return 1;
    }
    out = fopen(argv[1], "w");
    if (!out)
    {
        fprintf(stderr, "cannot open %s\n", argv[1]);
        return 1;
    }

    fprintf(out, "{");
    dump_color_quant_tables();
    dump_weight_quant_tables();
    dump_ise_vectors();
    dump_percentiles();

    fprintf(out, "\"bsds\":[");
    // Full (can_omit=false) descriptors: the complete legal mode/partition space
    dump_bsd(4, 4, 1, false, 1.0f, 4, true);
    dump_bsd(5, 5, 1, false, 1.0f, 4, true);
    dump_bsd(6, 6, 1, false, 1.0f, 4, true);
    dump_bsd(8, 8, 1, false, 1.0f, 4, true);
    dump_bsd(12, 12, 1, false, 1.0f, 4, true);
    dump_bsd(3, 3, 3, false, 1.0f, 4, true);
    dump_bsd(6, 6, 6, false, 1.0f, 4, true);
    // Selected (can_omit=true) descriptors at representative preset cutoffs:
    // -medium on 6x6 uses mode_cutoff 0.75/partition cutoff defaults; exact values
    // are asserted separately in config tests.
    dump_bsd(4, 4, 1, true, 0.65f, 4, true);
    dump_bsd(6, 6, 1, true, 0.75f, 4, true);
    dump_bsd(6, 6, 1, true, 0.5f, 3, true);
    dump_bsd(8, 8, 1, true, 0.95f, 4, false);
    fprintf(out, "]");

    fprintf(out, "}\n");
    fclose(out);
    return 0;
}
