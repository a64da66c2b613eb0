"""CLI front-end behavioral tests.

The TPU analog of the reference's astc_test_functional.py CLIP/CLIN suites
(reference: Test/astc_test_functional.py): positive flows per operation
mode, observable flag effects, and clean negative-path failures.
"""

import os

import numpy as np
import pytest

from astcenc_tpu import cli
from astcenc_tpu.io import image_io


@pytest.fixture(scope="module")
def small_png(tmp_path_factory):
    rng = np.random.RandomState(3)
    base = rng.randint(0, 255, (4, 4, 4), np.uint8)
    img = np.kron(base, np.ones((4, 4, 1), np.uint8)).astype(np.uint8)
    img[..., 3] = 255
    path = str(tmp_path_factory.mktemp("cli") / "in.png")
    image_io.save_image(path, img)
    return path


def run_cli(args, capsys=None):
    try:
        rc = cli.main(args)
    except SystemExit as e:
        rc = e.code
    return rc


def test_compress_decompress_roundtrip(small_png, tmp_path, capsys):
    astc = str(tmp_path / "out.astc")
    png = str(tmp_path / "out.png")
    assert run_cli(["-cl", small_png, astc, "4x4", "-fastest"]) == 0
    out = capsys.readouterr().out
    assert "Coding rate" in out and "Coding time" in out
    assert run_cli(["-dl", astc, png]) == 0
    assert os.path.exists(png)


def test_roundtrip_compare_metrics(small_png, tmp_path, capsys):
    png = str(tmp_path / "rt.png")
    assert run_cli(["-tl", small_png, png, "4x4", "-fastest"]) == 0
    out = capsys.readouterr().out
    # Reference "Quality metrics" + "Performance metrics" blocks
    # (astcenccli_error_metrics.cpp:350-413, astcenccli_toplevel.cpp:2351)
    assert "Quality metrics" in out
    assert "PSNR (LDR-RGBA):" in out
    assert "Alpha-weighted PSNR:" in out
    assert "PSNR (LDR-RGB):" in out
    assert "Performance metrics" in out
    assert "Decoding rate" in out


def test_repeats_flag(small_png, tmp_path, capsys):
    astc = str(tmp_path / "out.astc")
    assert run_cli(["-cl", small_png, astc, "4x4", "-fastest",
                    "-repeats", "2"]) == 0
    assert "Coding time" in capsys.readouterr().out


def test_ssw_flag_parses_and_zeroes_weights(small_png, tmp_path):
    astc = str(tmp_path / "out.astc")
    # -ssw rgb == alpha weight 0 (reference: astcenccli_toplevel.cpp:838-843)
    assert run_cli(["-cl", small_png, astc, "4x4", "-fastest",
                    "-ssw", "rgb", "-silent"]) == 0
    opts = cli._parse_options(["4x4", "-fastest", "-ssw", "rga"], True)
    ov = opts["overrides"]
    assert ov["cw_r_weight"] == 1.0 and ov["cw_g_weight"] == 1.0
    assert ov["cw_b_weight"] == 0.0 and ov["cw_a_weight"] == 1.0


def test_ssw_invalid_pattern():
    with pytest.raises(SystemExit):
        cli._parse_options(["4x4", "-fastest", "-ssw", "xyz"], True)
    with pytest.raises(SystemExit):
        cli._parse_options(["4x4", "-fastest", "-ssw", "rgbaa"], True)


def test_zdim_2d_block_error(small_png, tmp_path):
    astc = str(tmp_path / "out.astc")
    with pytest.raises(SystemExit):
        cli.main(["-cl", small_png, astc, "4x4", "-fastest", "-zdim", "2"])


def test_zdim_3d_slices(tmp_path, capsys):
    rng = np.random.RandomState(5)
    base = str(tmp_path / "vol.png")
    for zi in range(3):
        img = rng.randint(0, 255, (9, 9, 4), np.uint8)
        img[..., 3] = 255
        image_io.save_image(f"{tmp_path}/vol_{zi}.png", img)
    astc = str(tmp_path / "vol.astc")
    png = str(tmp_path / "vol_out.png")
    assert run_cli(["-cl", base, astc, "3x3x3", "-fastest",
                    "-zdim", "3", "-silent"]) == 0
    # Container must record a 3-deep image
    from astcenc_tpu.io import astc_file
    bd, idim, blocks = astc_file.read_astc(astc)
    assert bd == (3, 3, 3) and idim[2] == 3
    assert run_cli(["-dl", astc, png]) == 0


def test_zdim_missing_slice_fails(tmp_path):
    rng = np.random.RandomState(6)
    img = rng.randint(0, 255, (6, 6, 4), np.uint8)
    image_io.save_image(f"{tmp_path}/only_0.png", img)
    with pytest.raises(SystemExit):
        cli.main(["-cl", f"{tmp_path}/only.png", f"{tmp_path}/o.astc",
                  "3x3x3", "-fastest", "-zdim", "2"])


def test_negative_missing_args(small_png, tmp_path):
    for args in ([], ["-cl"], ["-cl", small_png],
                 ["-cl", small_png, str(tmp_path / "o.astc")],
                 ["-cl", small_png, str(tmp_path / "o.astc"), "4x4"],
                 ["-zz", "a", "b"],
                 ["-cl", small_png, str(tmp_path / "o.astc"), "4x4",
                  "-fastest", "-unknownflag"]):
        rc = run_cli(args)
        assert rc in (0, 1)
        if args and args[0] == "-cl" and len(args) >= 5 \
                and "-unknownflag" not in args:
            continue
        if args:
            assert rc == 1, args


def test_mpsnr_flag_parses():
    opts = cli._parse_options(["4x4", "-fastest", "-mpsnr", "-5", "5"], True)
    assert opts["mpsnr"] == (-5, 5)


def test_dtrace_tree(small_png, tmp_path):
    """-dtrace emits the reference-schema block/pass/candidate tree
    (astcenc_diagnostic_trace.h:17-115) parseable by tools/trace_diff."""
    from astcenc_tpu.codec.trace import parse_trace
    astc = str(tmp_path / "out.astc")
    trace = str(tmp_path / "trace.json")
    assert run_cli(["-cl", small_png, astc, "4x4", "-fastest",
                    "-dtrace", trace, "-silent"]) == 0
    name, attrs, children = parse_trace(trace)
    assert name == "root"
    blocks = [c for c in children if c[0] == "block"]
    assert len(blocks) == 16   # 16x16 image, 4x4 blocks
    b0 = blocks[0]
    assert "pos_x" in b0[1] and "tune_error_threshold" in b0[1]
    passes = [c for c in b0[2] if c[0] == "pass"]
    assert passes, "block node must contain pass nodes"
    p0 = passes[0]
    assert "partition_count" in p0[1] and "plane_count" in p0[1]
    cands = [c for c in p0[2] if c[0] == "candidate"]
    if cands:   # constant blocks have no candidates
        assert "weight_quant" in cands[0][1]
        assert "error_prerealign" in cands[0][1]


def test_dimage_set(small_png, tmp_path):
    """-dimage emits the reference's diagnostic image set
    (print_diagnostic_images, astcenccli_toplevel.cpp:1581-1898)."""
    astc = str(tmp_path / "dimg.astc")
    assert run_cli(["-cl", small_png, astc, "4x4", "-fastest",
                    "-dimage", "-silent"]) == 0
    stem = str(tmp_path / "dimg")
    for suffix in ("partitioning", "weight_plane2", "weight_density",
                   "weight_quant", "color_quant", "cem_index",
                   "cem_components", "cem_style", "cem_hdr"):
        p = f"{stem}_diag_{suffix}.png"
        assert os.path.exists(p), p
        img = np.asarray(image_io.load_image(p)[0])
        assert img.shape[:2] == (16, 16)


def test_pp_normalize(tmp_path):
    """-pp-normalize re-unit-length-normalizes RGB before encode
    (reference: image_preprocess_normalize,
    astcenccli_toplevel.cpp:1418-1452)."""
    # Non-unit normal-ish data: decoded output should be ~unit length
    img = np.zeros((8, 8, 4), np.uint8)
    img[..., 0] = 200   # overlong vector
    img[..., 1] = 180
    img[..., 2] = 220
    img[..., 3] = 255
    src = str(tmp_path / "n.png")
    image_io.save_image(src, img)
    out = str(tmp_path / "n_out.png")
    assert run_cli(["-tl", src, out, "4x4", "-fastest", "-pp-normalize",
                    "-silent"]) == 0
    dec, _, _ = image_io.load_image(out)
    v = dec[..., :3].astype(np.float32) / 255.0 * 2.0 - 1.0
    length = np.sqrt((v * v).sum(-1))
    assert np.all(np.abs(length - 1.0) < 0.1), length.max()


def test_pp_premultiply(tmp_path):
    """-pp-premultiply multiplies RGB by A before encode (reference:
    image_preprocess_premultiply, astcenccli_toplevel.cpp:1496-1540)."""
    img = np.zeros((8, 8, 4), np.uint8)
    img[..., 0] = 200
    img[..., 3] = 128   # half alpha -> premultiplied red ~100
    src = str(tmp_path / "p.png")
    image_io.save_image(src, img)
    out = str(tmp_path / "p_out.png")
    assert run_cli(["-tl", src, out, "4x4", "-fastest", "-pp-premultiply",
                    "-silent"]) == 0
    dec, _, _ = image_io.load_image(out)
    assert abs(int(dec[0, 0, 0]) - 100) <= 6, dec[0, 0, 0]
    # sRGB profile premultiplies in linear space -> different result
    out2 = str(tmp_path / "p_out2.png")
    assert run_cli(["-ts", src, out2, "4x4", "-fastest", "-pp-premultiply",
                    "-silent"]) == 0
    dec2, _, _ = image_io.load_image(out2)
    assert int(dec2[0, 0, 0]) > int(dec[0, 0, 0]) + 10


def test_pp_exclusive():
    rc = run_cli(["-cl", "x.png", "y.astc", "4x4", "-fastest",
                  "-pp-normalize", "-pp-premultiply"])
    assert rc != 0


def test_rgbm_codec_utility(tmp_path):
    """RGBM corpus utility round-trip (reference:
    Utils/astc_rgbm_codec.cpp)."""
    import importlib
    rgbm_codec = importlib.import_module("tools.rgbm_codec")
    rng = np.random.RandomState(7)
    hdr = (rng.rand(16, 16, 4).astype(np.float32) * 4.0)
    hdr[..., 3] = 1.0
    enc = rgbm_codec.rgbm_encode(hdr, 5.0, 16.0)
    assert enc.dtype == np.uint8 and enc.shape == (16, 16, 4)
    # Low clamp respected
    assert enc[..., 3].min() >= 16
    dec = rgbm_codec.rgbm_decode(enc, 5.0)
    # Round-trip error bounded by the 8-bit scale quantization
    err = np.abs(dec[..., :3] - hdr[..., :3])
    assert err.max() < 5.0 * 2.5 / 255.0 + 0.02, err.max()
