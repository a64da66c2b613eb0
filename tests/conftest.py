"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware. Set ASTC_TPU_TEST_REAL=1 to run against the
real backend instead.
"""

import json
import os
import subprocess
import sys

if not os.environ.get("ASTC_TPU_TEST_REAL"):
    # FORCE, not setdefault: driver shells export JAX_PLATFORMS (e.g.
    # "axon" tunnels) and a silent TPU fallback makes the suite
    # nondeterministic (TPU f32 matmuls round to bf16 by default).
    os.environ["JAX_PLATFORMS"] = "cpu"
    # Some PJRT plugin builds override jax_platforms at registration time;
    # JAX_PLATFORM_NAME still wins, so set both to really stay on CPU.
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # Single-CPU hosts: multi-threaded Eigen execution can deadlock
    if os.cpu_count() == 1 and "xla_cpu_multi_thread_eigen" not in flags:
        flags = (flags + " --xla_cpu_multi_thread_eigen=false").strip()
    os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not os.environ.get("ASTC_TPU_TEST_REAL"):
    # Belt and braces: auto-loaded pytest plugins (jaxtyping) import jax
    # BEFORE this conftest runs, so jax snapshotted the driver shell's
    # JAX_PLATFORMS (e.g. "axon") at import — the env vars above are then
    # too late. Updating the config works until a backend is initialized.
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache on CPU: jax 0.9.0's XLA:CPU AOT
# deserialization has segfaulted on this host inside long-lived
# many-executable pytest processes (SIGSEGV in
# compilation_cache.get_executable_and_time after cpu_aot_loader
# feature-mismatch warnings). Default is therefore OFF for plain pytest
# runs; tools/run_suite.sh opts back in per test file via
# ASTC_FORCE_CPU_CACHE, where a crash is isolated and attributable.
_force = os.environ.get("ASTC_FORCE_CPU_CACHE")
if _force:
    jax.config.update("jax_compilation_cache_dir", _force)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
elif not os.environ.get("ASTC_TPU_TEST_REAL"):
    jax.config.update("jax_compilation_cache_dir", None)
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run slow golden tests")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: slow golden test")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="needs --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

REF_DIR = os.environ.get("ASTC_REF_DIR", "/root/reference")
REF_BUILD = os.environ.get("ASTC_REF_BUILD", "/tmp/refbuild")
ORACLE_JSON = "/tmp/ref_tables.json"


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def oracle():
    """Reference-derived table dump, as parsed JSON (skip if unavailable)."""
    if not os.path.exists(ORACLE_JSON):
        tool = "/tmp/dump_ref_tables"
        if not os.path.exists(tool):
            script = os.path.join(_repo_root(), "tools", "build_ref_dump.sh")
            if not (os.path.isdir(REF_DIR) and os.path.isdir(REF_BUILD)):
                pytest.skip("reference oracle unavailable")
            try:
                subprocess.run([script], check=True, capture_output=True)
            except (subprocess.CalledProcessError, FileNotFoundError):
                pytest.skip("cannot build reference oracle")
        try:
            subprocess.run([tool, ORACLE_JSON], check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            pytest.skip("cannot run reference oracle")
    with open(ORACLE_JSON) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def ref_binary(tmp_path_factory):
    """Path to the reference astcenc CLI binary (skip if unavailable).

    Verifies a canary decode before handing the binary out: GCC 12 with
    -march=native on AVX-512 hosts miscompiles the reference's
    rgba_delta_unpack (inverted vpblendvb after folding the mask NOT), so a
    natively-built oracle decodes endpoint formats 9/13 non-conformantly.
    Build the oracle with -DASTCENC_ISA_AVX2=ON (see tools/build_ref_dump.sh).
    """
    path = os.path.join(REF_BUILD, "Source", "astcenc-native")
    if not os.path.exists(path):
        pytest.skip("reference binary unavailable")

    import numpy as np
    from astcenc_tpu.io import astc_file, image_io
    tmp = tmp_path_factory.mktemp("refcanary")
    blk = np.frombuffer(
        bytes.fromhex("5222cb12e2c1be68898e9eb4aeb747ec"), np.uint8)
    astc = str(tmp / "canary.astc")
    png = str(tmp / "canary.png")
    astc_file.write_astc(astc, (4, 4, 1), (4, 4, 1), blk[None])
    try:
        subprocess.run([path, "-dl", astc, png, "-silent"], check=True,
                       capture_output=True)
        texel0 = int(np.asarray(image_io.load_image(png)[0])[0, 0, 0])
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        pytest.skip("reference binary cannot decode the canary block")
    if texel0 != 129:
        pytest.skip(
            f"reference oracle is miscompiled (canary texel {texel0} != 129):"
            " rebuild with -DASTCENC_ISA_AVX2=ON, not ISA_NATIVE"
            " (GCC12+AVX512 breaks rgba_delta_unpack)")
    return path
