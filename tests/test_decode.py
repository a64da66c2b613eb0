"""Decoder golden tests: bit-exact against the reference codec.

Encodes test images with the reference binary, decodes the .astc output with
both the reference and our batched decoder, and requires exact u8 texel
equality. This is the strategy the build plan mandates (SURVEY.md §7 step 2):
the decoder is the bit-exact spec oracle everything downstream gates on.
"""

import os
import subprocess

import numpy as np
import pytest

from astcenc_tpu import api
from astcenc_tpu.config import Profile, Quality
from astcenc_tpu.io import astc_file, image_io

SMALL = "/root/reference/Test/Images/Small"


def _prep_image(tmp_path, size=64, alpha=False):
    src = os.path.join(SMALL, "LDR-RGBA/ldr-rgba-00.png" if alpha
                       else "LDR-RGB/ldr-rgb-00.png")
    if not os.path.exists(src):
        pytest.skip("reference test images unavailable")
    from PIL import Image
    img = Image.open(src).crop((0, 0, size, size))
    out = str(tmp_path / "in.png")
    img.save(out)
    return out


@pytest.mark.parametrize("block,preset,mode,profile", [
    ("4x4", "-fast", "l", Profile.LDR),
    ("6x6", "-medium", "l", Profile.LDR),
    pytest.param("5x5", "-fastest", "s", Profile.LDR_SRGB,
                 marks=pytest.mark.slow),
    pytest.param("8x8", "-thorough", "l", Profile.LDR,
                 marks=pytest.mark.slow),
    pytest.param("12x12", "-fast", "l", Profile.LDR,
                 marks=pytest.mark.slow),
    pytest.param("10x10", "-fastest", "s", Profile.LDR_SRGB,
                 marks=pytest.mark.slow),
])
def test_decode_bit_exact(ref_binary, tmp_path, block, preset, mode, profile):
    src = _prep_image(tmp_path, alpha=(preset == "-medium"))
    astc = str(tmp_path / "t.astc")
    refpng = str(tmp_path / "ref.png")
    subprocess.run([ref_binary, f"-c{mode}", src, astc, block, preset,
                    "-silent", "-j", "1"], check=True, capture_output=True)
    subprocess.run([ref_binary, f"-d{mode}", astc, refpng, "-silent"],
                   check=True, capture_output=True)

    bd, idim, blocks = astc_file.read_astc(astc)
    cfg = api.config_init(profile, bd[0], bd[1], bd[2], Quality.MEDIUM, 0)
    ctx = api.context_alloc(cfg)
    img = api.decompress_image(ctx, blocks, idim[0], idim[1], idim[2],
                               out_type="u8")
    ref, _, _ = image_io.load_image(refpng)
    np.testing.assert_array_equal(img[0], ref)


def test_decode_error_blocks():
    """Malformed physical blocks must decode to the error color, not crash."""
    cfg = api.config_init(Profile.LDR, 4, 4, 1, Quality.MEDIUM, 0)
    ctx = api.context_alloc(cfg)
    rng = np.random.RandomState(7)
    blocks = rng.randint(0, 256, size=(64, 16), dtype=np.uint8)
    img = api.decompress_image(ctx, blocks, 32, 32, 1, out_type="u8")
    assert img.shape == (1, 32, 32, 4)  # no crash; values are valid u8


def test_decode_void_extent_roundtrip():
    """A constant-color void-extent block decodes to the constant color."""
    cfg = api.config_init(Profile.LDR, 4, 4, 1, Quality.MEDIUM, 0)
    ctx = api.context_alloc(cfg)
    # Build a CONST_U16 block: magic header bytes then 4x u16 color
    # (reference: symbolic_to_physical, astcenc_symbolic_physical.cpp:110-126)
    blk = np.zeros((1, 16), np.uint8)
    blk[0, :8] = [0xFC, 0xFD, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF]
    color = (12850, 25700, 38550, 65535)  # u16 values = 50*257, 100*257, ...
    for i, c in enumerate(color):
        blk[0, 8 + 2 * i] = c & 0xFF
        blk[0, 9 + 2 * i] = c >> 8
    img = api.decompress_image(ctx, blk, 4, 4, 1, out_type="u8")
    np.testing.assert_array_equal(img[0, 0, 0], [50, 100, 150, 255])
    assert (img == img[0, 0, 0]).all()


def test_decode_corpus_data_files():
    """The repo's tiny golden .astc files decode to their PNG pairs."""
    data = "/root/reference/Test/Data"
    if not os.path.isdir(data):
        pytest.skip("reference data unavailable")
    from PIL import Image
    for stem, profile in (("LDR-A-1x1", Profile.LDR),
                          ("LDRS-A-1x1", Profile.LDR_SRGB)):
        bd, idim, blocks = astc_file.read_astc(os.path.join(data, f"{stem}.astc"))
        cfg = api.config_init(profile, bd[0], bd[1], bd[2], Quality.MEDIUM, 0)
        ctx = api.context_alloc(cfg)
        img = api.decompress_image(ctx, blocks, idim[0], idim[1], idim[2],
                                   out_type="u8")
        ref = np.asarray(Image.open(os.path.join(data, f"{stem}.png"))
                         .convert("RGBA"))
        np.testing.assert_array_equal(img[0], ref, err_msg=stem)


def test_malformed_astc_headers():
    """Negative corpus: every malformed file is rejected cleanly.

    Mirrors the reference CLI negative tests on Test/Data/negative_*.astc:
    container-level breakage fails at read; an illegal-but-parseable block
    size fails at config validation.
    """
    from astcenc_tpu.config import ConfigError
    from astcenc_tpu.io.astc_file import AstcFileError
    data = "/root/reference/Test/Data"
    if not os.path.isdir(data):
        pytest.skip("reference data unavailable")
    for name in ("negative_huge.astc", "negative_magic.astc",
                 "negative_short.astc", "empty.unk"):
        with pytest.raises(AstcFileError):
            astc_file.read_astc(os.path.join(data, name))
    for name in ("negative_block_size.astc", "negative_overflow.astc"):
        with pytest.raises((AstcFileError, ConfigError)):
            bd, _, _ = astc_file.read_astc(os.path.join(data, name))
            api.config_init(Profile.LDR, bd[0], bd[1], bd[2])


@pytest.mark.slow
@pytest.mark.parametrize("block", ["4x4", "6x6", "8x8", "12x12"])
def test_decode_fuzz_random_blocks(ref_binary, tmp_path, block):
    """Differential fuzz: random 128-bit blocks decode identically to the
    reference (the batched analog of fuzz_astc_physical_to_symbolic).

    Covers illegal modes (error blocks), void-extents, reserved encodings —
    whatever 4096 random blocks happen to contain.
    """
    bx, by = (int(v) for v in block.split("x"))
    n = 4096
    rng = np.random.RandomState(sum(map(ord, block)))
    blocks = rng.randint(0, 256, (n, 16), dtype=np.uint8)

    nx = 64
    ny = (n + nx - 1) // nx
    w, h = nx * bx, ny * by
    astc = str(tmp_path / "fuzz.astc")
    pad = np.zeros((nx * ny, 16), np.uint8)
    pad[:n] = blocks
    astc_file.write_astc(astc, (bx, by, 1), (w, h, 1), pad)

    refpng = str(tmp_path / "fuzz_ref.png")
    subprocess.run([ref_binary, "-dl", astc, refpng, "-silent"],
                   check=True, capture_output=True)
    ref = np.asarray(image_io.load_image(refpng)[0])

    cfg = api.config_init(Profile.LDR, bx, by, 1, Quality.MEDIUM, 0)
    ctx = api.context_alloc(cfg)
    ours = api.decompress_image(ctx, pad, w, h, 1, out_type="u8")[0]
    np.testing.assert_array_equal(ours, ref)


def test_decode_rgb_delta_sign_extension_spec():
    """Spec anchor for FMT_RGB_DELTA (CEM 9) sign extension.

    Per the ASTC spec's bit_transfer_signed (and the reference source,
    astcenc_vecmathlib_common_4.h:364-373), delta values are sign-extended
    from bit 5 after the shift, here yielding deltas (-28,-29,-30), a
    negative rgb_sum, and therefore the blue-contract + swap path. Pinned
    as a unit test because a GCC12/-march=native build of the reference
    miscompiles exactly this step (see tools/build_ref_dump.sh) — this
    hardcodes the conformant answer independent of any local oracle.
    """
    blk = np.frombuffer(
        bytes.fromhex("5222cb12e2c1be68898e9eb4aeb747ec"), np.uint8)[None]
    cfg = api.config_init(Profile.LDR, 4, 4, 1, Quality.MEDIUM, 0)
    ctx = api.context_alloc(cfg)
    dec = api.decompress_image(ctx, blk.copy(), 4, 4, 1, out_type="u8")[0]
    expect_rg = np.array([
        [[129, 138], [130, 139], [136, 145], [124, 133]],
        [[126, 135], [127, 136], [133, 142], [120, 129]],
        [[130, 139], [120, 129], [127, 136], [136, 145]],
        [[126, 135], [113, 122], [108, 117], [126, 135]]])
    np.testing.assert_array_equal(np.asarray(dec)[..., :2], expect_rg)
