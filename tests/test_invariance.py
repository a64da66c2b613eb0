"""Cross-backend encode invariance: CPU vs TPU on a fixed corpus.

The reference guarantees identical output across thread counts and pays
for cross-ISA stability with fixed-width accumulators
(astcenc_vecmathlib.h:93-97) plus a fast-math environment check
(validate_cpu_float, astcenc_entry.cpp:215-227). The TPU analog has two
layers:

1. Same-backend determinism/sharding invariance — already gated
   (tests/test_parallel.py, __graft_entry__.dryrun_multichip: sharded ==
   single-device bit-identical).
2. Cross-backend (XLA:CPU vs XLA:TPU) — NOT bit-identical by design: the
   TPU path runs the Pallas trial kernels whose realign reductions use a
   different (fixed) summation order than the XLA formulation, and XLA
   itself fuses/FMAs differently per backend. This test BOUNDS the
   divergence instead: the two encodes must agree on the overwhelming
   majority of blocks, and decoded quality must match within the
   BASELINE.json tolerance (0.05 dB) — i.e. any disagreement is an
   equivalent-quality encoding choice, not an error.

Runs only with a real accelerator attached (ASTC_TPU_TEST_REAL=1); the
CPU half executes in a subprocess so both backends stay in their natural
configuration. Wired into `make gate` on TPU-present hosts.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ENC_SNIPPET = """
import sys, numpy as np
sys.path.insert(0, {repo!r})
from astcenc_tpu import api
from astcenc_tpu.config import Profile, Quality
img = np.load({img!r})
cfg = api.config_init(Profile.LDR, 6, 6, 1, Quality.FASTEST, 0)
ctx = api.context_alloc(cfg)
np.save({out!r}, api.compress_image(ctx, img))
"""


@pytest.mark.skipif(not os.environ.get("ASTC_TPU_TEST_REAL"),
                    reason="needs a real accelerator (ASTC_TPU_TEST_REAL=1)")
def test_cpu_tpu_encode_divergence_bounded(tmp_path):
    from PIL import Image
    src = "/root/reference/Test/Images/Small/LDR-RGB/ldr-rgb-00.png"
    if not os.path.exists(src):
        pytest.skip("reference test images unavailable")
    img = np.asarray(Image.open(src).convert("RGBA").crop((0, 0, 96, 96)))
    img_npy = str(tmp_path / "img.npy")
    np.save(img_npy, img)

    outs = {}
    for backend in ("cpu", "tpu"):
        out = str(tmp_path / f"blocks_{backend}.npy")
        env = dict(os.environ)
        if backend == "cpu":
            env["JAX_PLATFORMS"] = "cpu"
            env.pop("ASTC_TPU_TEST_REAL", None)
        code = _ENC_SNIPPET.format(repo=REPO, img=img_npy, out=out)
        subprocess.run([sys.executable, "-c", code], env=env, check=True,
                       timeout=3600)
        outs[backend] = np.load(out)

    same = np.all(outs["cpu"] == outs["tpu"], axis=1)
    frac = float(same.mean())

    # Decode both through OUR decoder and compare quality.
    from astcenc_tpu import api
    from astcenc_tpu.config import Profile, Quality
    from astcenc_tpu.utils import metrics
    cfg = api.config_init(Profile.LDR, 6, 6, 1, Quality.FASTEST, 0)
    ctx = api.context_alloc(cfg)
    dec = {b: api.decompress_image(ctx, outs[b], 96, 96)[0]
           for b in outs}
    p_cpu = metrics.psnr(img, dec["cpu"])
    p_tpu = metrics.psnr(img, dec["tpu"])

    print(json.dumps({"identical_block_fraction": round(frac, 4),
                      "psnr_cpu": round(p_cpu, 4),
                      "psnr_tpu": round(p_tpu, 4)}))
    # Documented bound: backends may pick different equivalent encodings
    # for a small minority of blocks; quality must be indistinguishable.
    assert frac >= 0.90, f"identical block fraction {frac}"
    assert abs(p_cpu - p_tpu) <= 0.05, (p_cpu, p_tpu)
