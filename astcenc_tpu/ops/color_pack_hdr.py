"""Batched encoder-side HDR color endpoint packing.

TPU redesign of the HDR quantizers in pack_color_endpoints
(reference: Source/astcenc_color_quantize.cpp:925-1905): the reference's
"try modes in order, first fit wins" loops and its
quantize_and_unquantize_retain_top_N_bits decrement loops become parallel
candidate evaluation with first-valid selection.

All colors are in the 0..65535 LNS-code domain.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import color_pack as cp
from . import color_unquant as cuq


def _rtn(x):
    return jnp.floor(x + 0.5).astype(jnp.int32)


def _rtn_trunc(x):
    """astc::flt2int_rtn for possibly-negative values: C's (int)(v+0.5f)
    truncates toward zero (reference: astcenc_mathlib.h:328-332) — floor
    and trunc differ below zero, and the HDR RGB d deltas go negative."""
    return jnp.trunc(x + 0.5).astype(jnp.int32)


def _retain_top_bits(qidx, value, top_mask: int, max_steps: int = 72):
    """quantize_and_unquantize_retain_top_{two,four}_bits, parallelized.

    Finds the first v' in {v, v-1, ...} whose quantization preserves
    (v' & top_mask); evaluated for all steps at once
    (reference: :833-905).
    """
    k = jnp.arange(max_steps, dtype=jnp.int32)
    vk = jnp.clip(value[..., None] - k, 0, 255)
    qk = cp.quant_color(qidx[..., None], vk)
    ok = (qk & top_mask) == (vk & top_mask)
    first = jnp.argmax(ok, axis=-1)
    oh = (jnp.arange(max_steps, dtype=jnp.int32) == first[..., None])
    qsel = jnp.sum(jnp.where(oh, qk, 0), axis=-1)
    # A fit always exists (quantizing 0 preserves top bits of 0)
    return qsel


def quantize_hdr_rgbo(color, qidx):
    """FMT_HDR_RGB_SCALE from the rgbo vector (reference: :925-1253).

    color: (B, 4) rgbo (r, g, b, scale); returns (B, 4) packed values.
    """
    color = color.at[:, 0].add(color[:, 3])
    color = color.at[:, 1].add(color[:, 3])
    color = color.at[:, 2].add(color[:, 3])
    color = jnp.clip(color, 0.0, 65535.0)
    color_bak = color

    r, g, b = color[:, 0], color[:, 1], color[:, 2]
    majcomp = jnp.where((r > g) & (r > b), 0, jnp.where(g > b, 1, 2))
    cr = jnp.where(majcomp == 1, g, jnp.where(majcomp == 2, b, r))
    cg = jnp.where(majcomp == 1, r, g)
    cb = jnp.where(majcomp == 2, r, b)

    r_base = cr
    g_base = cr - cg
    b_base = cr - cb
    s_base = color[:, 3]

    mode_bits = ((11, 5, 7), (11, 6, 5), (10, 5, 8), (9, 6, 7), (8, 7, 6))
    mode_cutoffs = ((1024, 4096), (2048, 1024), (2048, 16384),
                    (8192, 16384), (32768, 16384))
    mode_rscales = (32.0, 32.0, 64.0, 128.0, 256.0)

    B = color.shape[0]
    out = jnp.zeros((B, 4), jnp.int32)
    done = jnp.zeros((B,), bool)

    for mode in range(5):
        gb_cut, s_cut = mode_cutoffs[mode]
        pre_ok = ((g_base <= gb_cut) & (b_base <= gb_cut)
                  & (s_base <= s_cut))

        mode_enc = (mode | (majcomp << 2)) if mode < 4 else (majcomp | 0xC)
        if mode >= 4:
            mode_enc = majcomp | 0xC
        else:
            mode_enc = mode | (majcomp << 2)
        mode_rscale = mode_rscales[mode]
        mode_scale = 1.0 / mode_rscale
        gb_intcut = 1 << mode_bits[mode][1]
        s_intcut = 1 << mode_bits[mode][2]

        r_int = _rtn(r_base * mode_scale)
        r_low = (r_int & 0x3F) | ((mode_enc & 3) << 6)
        r_q = _retain_top_bits(qidx, r_low, 0xC0)
        r_int = (r_int & ~0x3F) | (r_q & 0x3F)
        r_f = r_int.astype(jnp.float32) * mode_rscale

        g_f = jnp.clip(r_f - cg, 0.0, 65535.0)
        b_f = jnp.clip(r_f - cb, 0.0, 65535.0)
        g_int = _rtn(g_f * mode_scale)
        b_int = _rtn(b_f * mode_scale)
        ok = pre_ok & (g_int < gb_intcut) & (b_int < gb_intcut)

        g_low = g_int & 0x1F
        b_low = b_int & 0x1F

        bit0 = {0: (r_int >> 9) & 1, 2: (r_int >> 9) & 1,
                1: (r_int >> 8) & 1, 3: (r_int >> 8) & 1,
                4: (g_int >> 6) & 1}[mode]
        bit2 = ((r_int >> 7) & 1) if mode < 4 else ((b_int >> 6) & 1)
        bit1 = ((r_int >> 8) & 1) if mode in (0, 2) else ((g_int >> 5) & 1)
        if mode == 0:
            bit3 = (r_int >> 10) & 1
        elif mode == 2:
            bit3 = (r_int >> 6) & 1
        else:
            bit3 = (b_int >> 5) & 1

        g_low = g_low | ((mode_enc & 0x4) << 5) | (bit0 << 6) | (bit1 << 5)
        b_low = b_low | ((mode_enc & 0x8) << 4) | (bit2 << 6) | (bit3 << 5)

        g_q = _retain_top_bits(qidx, g_low, 0xF0)
        b_q = _retain_top_bits(qidx, b_low, 0xF0)
        g_int = (g_int & ~0x1F) | (g_q & 0x1F)
        b_int = (b_int & ~0x1F) | (b_q & 0x1F)
        g_f = g_int.astype(jnp.float32) * mode_rscale
        b_f = b_int.astype(jnp.float32) * mode_rscale

        rgb_errsum = (r_f - cr) + (r_f - g_f - cg) + (r_f - b_f - cb)
        s_f = jnp.clip(s_base + rgb_errsum * jnp.float32(1.0 / 3.0),
                       0.0, 1e9)
        s_int = _rtn(s_f * mode_scale)
        ok = ok & (s_int < s_intcut)

        s_low = s_int & 0x1F
        bit6 = ((r_int >> 9) & 1) if mode == 1 else ((s_int >> 5) & 1)
        if mode == 4:
            bit5 = (r_int >> 7) & 1
        elif mode == 1:
            bit5 = (r_int >> 10) & 1
        else:
            bit5 = (s_int >> 6) & 1
        bit4 = ((s_int >> 7) & 1) if mode == 2 else ((r_int >> 6) & 1)
        s_low = s_low | (bit6 << 5) | (bit5 << 6) | (bit4 << 7)
        s_q = _retain_top_bits(qidx, s_low, 0xF0)

        vals = jnp.stack([r_q, g_q, b_q, s_q], axis=-1)
        take = ok & ~done
        out = jnp.where(take[:, None], vals, out)
        done = done | ok

    # Fallback mode #5 (reference: :1210-1253 — rgb clamps first; the
    # alpha base is the raw value, clamped only after the error add)
    v = jnp.clip(color_bak[:, :3], 0.0, 65020.0)
    iv = _rtn(v * jnp.float32(1.0 / 512.0))
    cv = iv.astype(jnp.float32) * 512.0
    errsum = ((cv[:, 0] - v[:, 0]) + (cv[:, 1] - v[:, 1])
              + (cv[:, 2] - v[:, 2]))
    s3 = jnp.clip(color_bak[:, 3] + errsum * jnp.float32(1.0 / 3.0),
                  0.0, 65020.0)
    i3 = _rtn(s3 * jnp.float32(1.0 / 512.0))
    enc0 = (iv[:, 0] & 0x3F) | 0xC0
    enc1 = (iv[:, 1] & 0x7F) | 0x80
    enc2 = (iv[:, 2] & 0x7F) | 0x80
    enc3 = (i3 & 0x7F) | ((iv[:, 0] & 0x40) << 1)
    fb = jnp.stack([_retain_top_bits(qidx, e, 0xF0)
                    for e in (enc0, enc1, enc2, enc3)], axis=-1)
    return jnp.where(done[:, None], out, fb)


def quantize_hdr_rgb(c0, c1, qidx):
    """FMT_HDR_RGB (reference: :1253-1640). Returns (B, 6) packed values."""
    c0 = jnp.clip(c0, 0.0, 65535.0)
    c1 = jnp.clip(c1, 0.0, 65535.0)
    c0b, c1b = c0, c1

    r1, g1, b1 = c1[:, 0], c1[:, 1], c1[:, 2]
    majcomp = jnp.where((r1 > g1) & (r1 > b1), 0, jnp.where(g1 > b1, 1, 2))

    def swz(c):
        r, g, b = c[:, 0], c[:, 1], c[:, 2]
        rr = jnp.where(majcomp == 1, g, jnp.where(majcomp == 2, b, r))
        gg = jnp.where(majcomp == 1, r, g)
        bb = jnp.where(majcomp == 2, r, b)
        return rr, gg, bb

    c0r, c0g, c0bl = swz(c0)
    c1r, c1g, c1bl = swz(c1)

    a_base = jnp.clip(c1r, 0.0, 65535.0)
    b0_base = a_base - c1g
    b1_base = a_base - c1bl
    c_base = a_base - c0r
    d0_base = a_base - b0_base - c_base - c0g
    d1_base = a_base - b1_base - c_base - c0bl

    mode_bits = ((9, 7, 6, 7), (9, 8, 6, 6), (10, 6, 7, 7), (10, 7, 7, 6),
                 (11, 8, 6, 5), (11, 6, 8, 6), (12, 7, 7, 5), (12, 6, 7, 6))
    mode_cutoffs = ((16384, 8192, 8192), (32768, 8192, 4096),
                    (4096, 8192, 4096), (8192, 8192, 2048),
                    (8192, 2048, 512), (2048, 8192, 1024),
                    (2048, 2048, 256), (1024, 2048, 512))
    mode_rscales = (128.0, 128.0, 64.0, 64.0, 32.0, 32.0, 16.0, 16.0)

    B = c0.shape[0]
    out = jnp.zeros((B, 6), jnp.int32)
    done = jnp.zeros((B,), bool)

    for mode in range(7, -1, -1):
        b_cut, c_cut, d_cut = mode_cutoffs[mode]
        pre_ok = ((b0_base <= b_cut) & (b1_base <= b_cut)
                  & (c_base <= c_cut) & (jnp.abs(d0_base) <= d_cut)
                  & (jnp.abs(d1_base) <= d_cut))

        mode_rscale = mode_rscales[mode]
        mode_scale = 1.0 / mode_rscale
        b_intcut = 1 << mode_bits[mode][1]
        c_intcut = 1 << mode_bits[mode][2]
        d_intcut = 1 << (mode_bits[mode][3] - 1)

        a_int = _rtn(a_base * mode_scale)
        a_low = a_int & 0xFF
        a_q = cp.quant_color(qidx, a_low)
        a_int = (a_int & ~0xFF) | a_q
        a_f = a_int.astype(jnp.float32) * mode_rscale

        c_f = jnp.clip(a_f - c0r, 0.0, 65535.0)
        c_int = _rtn(c_f * mode_scale)
        ok = pre_ok & (c_int < c_intcut)
        c_low = (c_int & 0x3F) | ((mode & 1) << 7) | ((a_int & 0x100) >> 2)
        c_q = _retain_top_bits(qidx, c_low, 0xC0)
        c_int = (c_int & ~0x3F) | (c_q & 0x3F)
        c_f = c_int.astype(jnp.float32) * mode_rscale

        b0_f = jnp.clip(a_f - c1g, 0.0, 65535.0)
        b1_f = jnp.clip(a_f - c1bl, 0.0, 65535.0)
        b0_int = _rtn(b0_f * mode_scale)
        b1_int = _rtn(b1_f * mode_scale)
        ok = ok & (b0_int < b_intcut) & (b1_int < b_intcut)

        b0_low = b0_int & 0x3F
        b1_low = b1_int & 0x3F
        if mode in (0, 1, 3, 4, 6):
            bit0 = (b0_int >> 6) & 1
            bit1 = (b1_int >> 6) & 1
        elif mode == 2:
            bit0 = (a_int >> 9) & 1
            bit1 = (c_int >> 6) & 1
        else:  # 5, 7
            bit0 = (a_int >> 9) & 1
            bit1 = (a_int >> 10) & 1
        b0_low = b0_low | (bit0 << 6) | (((mode >> 1) & 1) << 7)
        b1_low = b1_low | (bit1 << 6) | (((mode >> 2) & 1) << 7)
        b0_q = _retain_top_bits(qidx, b0_low, 0xC0)
        b1_q = _retain_top_bits(qidx, b1_low, 0xC0)
        b0_int = (b0_int & ~0x3F) | (b0_q & 0x3F)
        b1_int = (b1_int & ~0x3F) | (b1_q & 0x3F)
        b0_f = b0_int.astype(jnp.float32) * mode_rscale
        b1_f = b1_int.astype(jnp.float32) * mode_rscale

        d0_f = jnp.clip(a_f - b0_f - c_f - c0g, -65535.0, 65535.0)
        d1_f = jnp.clip(a_f - b1_f - c_f - c0bl, -65535.0, 65535.0)
        d0_int = _rtn_trunc(d0_f * mode_scale)
        d1_int = _rtn_trunc(d1_f * mode_scale)
        ok = ok & (jnp.abs(d0_int) < d_intcut) & (jnp.abs(d1_int) < d_intcut)

        d0_low = d0_int & 0x1F
        d1_low = d1_int & 0x1F
        if mode in (0, 2):
            bit2 = (d0_int >> 6) & 1
            bit3 = (d1_int >> 6) & 1
        elif mode in (1, 4):
            bit2 = (b0_int >> 7) & 1
            bit3 = (b1_int >> 7) & 1
        elif mode == 3:
            bit2 = (a_int >> 9) & 1
            bit3 = (c_int >> 6) & 1
        elif mode == 5:
            bit2 = (c_int >> 7) & 1
            bit3 = (c_int >> 6) & 1
        else:  # 6, 7
            bit2 = (a_int >> 11) & 1
            bit3 = (c_int >> 6) & 1
        if mode in (4, 6):
            bit4 = (a_int >> 9) & 1
            bit5 = (a_int >> 10) & 1
        else:
            bit4 = (d0_int >> 5) & 1
            bit5 = (d1_int >> 5) & 1
        d0_low = d0_low | (bit2 << 6) | (bit4 << 5) | ((majcomp & 1) << 7)
        d1_low = (d1_low | (bit3 << 6) | (bit5 << 5)
                  | (((majcomp >> 1) & 1) << 7))
        d0_q = _retain_top_bits(qidx, d0_low, 0xF0)
        d1_q = _retain_top_bits(qidx, d1_low, 0xF0)

        vals = jnp.stack([a_q, c_q, b0_q, b1_q, d0_q, d1_q], axis=-1)
        take = ok & ~done
        out = jnp.where(take[:, None], vals, out)
        done = done | ok

    # Flat fallback (reference: :1600-1640)
    v = [jnp.clip(x, 0.0, 65020.0) for x in
         (c0b[:, 0], c1b[:, 0], c0b[:, 1], c1b[:, 1], c0b[:, 2], c1b[:, 2])]
    fb = [cp.quant_color(qidx, _rtn(v[i] / 256.0)) for i in range(4)]
    fb += [_retain_top_bits(qidx, _rtn(v[i] / 512.0) + 128, 0xC0)
           for i in range(4, 6)]
    fbv = jnp.stack(fb, axis=-1)
    return jnp.where(done[:, None], out, fbv)


def quantize_hdr_luminance_large(c0, c1, qidx):
    """FMT_HDR_LUMINANCE_LARGE_RANGE (reference: :1644-1706)."""
    lum0 = jnp.sum(c0[:, :3], -1) / 3.0
    lum1 = jnp.sum(c1[:, :3], -1) / 3.0
    swap = lum1 < lum0
    avg = (lum0 + lum1) * 0.5
    lum0 = jnp.where(swap, avg, lum0)
    lum1 = jnp.where(swap, avg, lum1)
    il0 = _rtn(lum0)
    il1 = _rtn(lum1)

    up0 = jnp.clip((il0 + 128) >> 8, 0, 255)
    up1 = jnp.clip((il1 + 128) >> 8, 0, 255)
    lo0 = jnp.clip((il1 + 256) >> 8, 0, 255)
    lo1 = jnp.clip(il0 >> 8, 0, 255)

    ud0 = (up0 << 8) - il0
    ud1 = (up1 << 8) - il1
    ld0 = ((lo1 << 8) + 128) - il0
    ld1 = ((lo0 << 8) - 128) - il1
    upper_err = ud0 * ud0 + ud1 * ud1
    lower_err = ld0 * ld0 + ld1 * ld1
    use_up = upper_err < lower_err
    v0 = jnp.where(use_up, up0, lo0)
    v1 = jnp.where(use_up, up1, lo1)
    return jnp.stack([cp.quant_color(qidx, v0),
                      cp.quant_color(qidx, v1)], axis=-1)


def try_quantize_hdr_luminance_small(c0, c1, qidx):
    """FMT_HDR_LUMINANCE_SMALL_RANGE (reference: :1716-1812).

    Returns (ok (B,), vals (B, 2)).
    """
    lum0 = jnp.sum(c0[:, :3], -1) / 3.0
    lum1 = jnp.sum(c1[:, :3], -1) / 3.0
    swap = lum1 < lum0
    avg = (lum0 + lum1) * 0.5
    lum0 = jnp.where(swap, avg, lum0)
    lum1 = jnp.where(swap, avg, lum1)
    il0 = _rtn(lum0)
    il1 = _rtn(lum1)
    feasible = (il1 - il0) <= 2048

    # High-precision submode
    lo = jnp.clip((il0 + 16) >> 5, 0, 2047)
    hi = jnp.clip((il1 + 16) >> 5, 0, 2047)
    v0 = lo & 0x7F
    v0e = cp.quant_color(qidx, v0)
    hp_ok0 = v0e < 0x80
    lo2 = (lo & ~0x7F) | v0e
    diff = hi - lo2
    hp_ok1 = (diff >= 0) & (diff <= 15)
    v1 = ((lo2 >> 3) & 0xF0) | jnp.clip(diff, 0, 15)
    v1e = cp.quant_color(qidx, v1)
    hp_ok2 = (v1e & 0xF0) == (v1 & 0xF0)
    hp_ok = hp_ok0 & hp_ok1 & hp_ok2
    hp_vals = jnp.stack([v0e, v1e], axis=-1)

    # Low-precision submode
    lo = jnp.clip((il0 + 32) >> 6, 0, 1023)
    hi = jnp.clip((il1 + 32) >> 6, 0, 1023)
    v0 = (lo & 0x7F) | 0x80
    v0e = cp.quant_color(qidx, v0)
    lp_ok0 = (v0e & 0x80) != 0
    lo2 = (lo & ~0x7F) | (v0e & 0x7F)
    diff = hi - lo2
    lp_ok1 = (diff >= 0) & (diff <= 31)
    v1 = ((lo2 >> 2) & 0xE0) | jnp.clip(diff, 0, 31)
    v1e = cp.quant_color(qidx, v1)
    lp_ok2 = (v1e & 0xE0) == (v1 & 0xE0)
    lp_ok = lp_ok0 & lp_ok1 & lp_ok2
    lp_vals = jnp.stack([v0e, v1e], axis=-1)

    ok = feasible & (hp_ok | lp_ok)
    vals = jnp.where(hp_ok[:, None], hp_vals, lp_vals)
    return ok, vals


def quantize_hdr_alpha(a0, a1, qidx):
    """HDR alpha (reference: :1816-1885). Returns (B, 2)."""
    a0 = jnp.clip(a0, 0.0, 65280.0)
    a1 = jnp.clip(a1, 0.0, 65280.0)
    ia0 = _rtn(a0)
    ia1 = _rtn(a1)

    B = ia0.shape[0]
    out = jnp.zeros((B, 2), jnp.int32)
    done = jnp.zeros((B,), bool)
    testbits = (0xE0, 0xF0, 0xF8)

    for i in (2, 1, 0):
        val0 = (ia0 + (128 >> i)) >> (8 - i)
        val1 = (ia1 + (128 >> i)) >> (8 - i)
        v6 = (val0 & 0x7F) | ((i & 1) << 7)
        v6e = cp.quant_color(qidx, v6)
        ok = ((v6 ^ v6e) & 0x80) == 0
        val0b = (val0 & ~0x7F) | (v6e & 0x7F)
        diff = val1 - val0b
        cutoff = 32 >> i
        mask = 2 * cutoff - 1
        ok = ok & (diff >= -cutoff) & (diff < cutoff)
        v7 = ((i & 2) << 6) | ((val0b >> 7) << (6 - i)) | (diff & mask)
        v7e = cp.quant_color(qidx, v7)
        ok = ok & (((v7 ^ v7e) & testbits[i]) == 0)
        vals = jnp.stack([v6e, v7e], axis=-1)
        take = ok & ~done
        out = jnp.where(take[:, None], vals, out)
        done = done | ok

    v6 = ((ia0 + 256) >> 9) | 0x80
    v7 = ((ia1 + 256) >> 9) | 0x80
    fb = jnp.stack([cp.quant_color(qidx, v6),
                    cp.quant_color(qidx, v7)], axis=-1)
    return jnp.where(done[:, None], out, fb)


def pack_color_endpoints_hdr(ep0, ep1, rgbs, rgbo, req_fmt, quant_level):
    """HDR-format arm of pack_color_endpoints (reference: :2049-2141).

    Handles FMT_HDR_RGB_SCALE / FMT_HDR_RGB / FMT_HDR_LUMINANCE_* /
    FMT_HDR_RGB_LDR_ALPHA / FMT_HDR_RGBA. Returns (fmt, values (B, 8)).
    """
    from ..tables import ise
    qidx = cp.QuantQ(jnp.clip(quant_level - ise.QUANT_6, 0, 16))
    B = ep0.shape[0]
    zero8 = jnp.zeros((B, 8), jnp.int32)

    v_rgbo = zero8.at[:, :4].set(quantize_hdr_rgbo(rgbo, qidx))
    v_rgb6 = quantize_hdr_rgb(ep0, ep1, qidx)
    v_rgb = zero8.at[:, :6].set(v_rgb6)

    sm_ok, sm_vals = try_quantize_hdr_luminance_small(ep0, ep1, qidx)
    lg_vals = quantize_hdr_luminance_large(ep0, ep1, qidx)
    v_lum = zero8.at[:, :2].set(jnp.where(sm_ok[:, None], sm_vals, lg_vals))
    f_lum = jnp.where(sm_ok, cuq.FMT_HDR_LUMINANCE_SMALL_RANGE,
                      cuq.FMT_HDR_LUMINANCE_LARGE_RANGE)

    # HDR RGB + LDR alpha
    a0 = jnp.clip(ep0[:, 3] / 257.0, 0.0, 255.0)
    a1 = jnp.clip(ep1[:, 3] / 257.0, 0.0, 255.0)
    v_rgba_ldr = v_rgb.at[:, 6].set(cp.quant_color_res(qidx, _rtn(a0), a0))
    v_rgba_ldr = v_rgba_ldr.at[:, 7].set(
        cp.quant_color_res(qidx, _rtn(a1), a1))

    # HDR RGBA
    ha = quantize_hdr_alpha(ep0[:, 3], ep1[:, 3], qidx)
    v_rgba_hdr = v_rgb.at[:, 6:8].set(ha)

    sel = [req_fmt == cuq.FMT_HDR_RGB_SCALE,
           req_fmt == cuq.FMT_HDR_RGB,
           (req_fmt == cuq.FMT_HDR_LUMINANCE_SMALL_RANGE)
           | (req_fmt == cuq.FMT_HDR_LUMINANCE_LARGE_RANGE),
           req_fmt == cuq.FMT_HDR_RGB_LDR_ALPHA,
           req_fmt == cuq.FMT_HDR_RGBA]
    out_fmt = jnp.select(sel, [
        jnp.full((B,), cuq.FMT_HDR_RGB_SCALE),
        jnp.full((B,), cuq.FMT_HDR_RGB),
        f_lum,
        jnp.full((B,), cuq.FMT_HDR_RGB_LDR_ALPHA),
        jnp.full((B,), cuq.FMT_HDR_RGBA)],
        default=jnp.full((B,), cuq.FMT_HDR_RGB))
    out_vals = jnp.select([s[:, None] for s in sel],
                          [v_rgbo, v_rgb, v_lum, v_rgba_ldr, v_rgba_hdr],
                          default=v_rgb)
    return out_fmt, out_vals


def pack_color_endpoints(profile, ep0, ep1, rgbs, rgbo, req_fmt, quant_level):
    """Profile-aware dispatcher over the LDR and HDR packers."""
    if profile < 2:  # LDR / sRGB
        return cp.pack_color_endpoints_ldr(ep0, ep1, rgbs, req_fmt,
                                           quant_level)
    fmt_l, vals_l = cp.pack_color_endpoints_ldr(ep0, ep1, rgbs, req_fmt,
                                                quant_level)
    fmt_h, vals_h = pack_color_endpoints_hdr(ep0, ep1, rgbs, rgbo, req_fmt,
                                             quant_level)
    is_hdr_fmt = ((req_fmt == cuq.FMT_HDR_RGB_SCALE)
                  | (req_fmt == cuq.FMT_HDR_RGB)
                  | (req_fmt == cuq.FMT_HDR_LUMINANCE_SMALL_RANGE)
                  | (req_fmt == cuq.FMT_HDR_LUMINANCE_LARGE_RANGE)
                  | (req_fmt == cuq.FMT_HDR_RGB_LDR_ALPHA)
                  | (req_fmt == cuq.FMT_HDR_RGBA))
    fmt = jnp.where(is_hdr_fmt, fmt_h, fmt_l)
    vals = jnp.where(is_hdr_fmt[:, None], vals_h, vals_l)
    return fmt, vals
