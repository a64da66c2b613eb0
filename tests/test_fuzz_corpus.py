"""Malformed-container corpus gate.

Every committed seed in tests/data/fuzz must fail with a clean, typed
error — never crash, hang, or leak an internal exception. Mirrors the
reference's fuzzer corpora discipline (Source/Fuzzers/
fuzz_astc_physical_to_symbolic.cpp:17-62, Test/Data/).
"""

import os
import struct
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.path.join(os.path.dirname(__file__), "data", "fuzz")

_CLEAN = (ValueError, OSError, KeyError, EOFError, NotImplementedError,
          struct.error)


def _load(path):
    from astcenc_tpu.io import astc_file, dds, ktx
    if path.endswith(".astc"):
        return astc_file.read_astc(path)
    if path.endswith(".ktx"):
        return ktx.read_ktx(path)
    if path.endswith(".dds"):
        return dds.read_dds(path)
    raise AssertionError(f"unknown corpus extension: {path}")


@pytest.mark.parametrize("name", sorted(os.listdir(CORPUS)))
def test_corpus_fails_cleanly(name):
    path = os.path.join(CORPUS, name)
    try:
        _load(path)
        # A parse that *succeeds* on a malformed file is acceptable only if
        # it returned something (a permissive reader) — never silently None.
    except _CLEAN:
        pass
    except Exception as e:  # noqa: BLE001
        if not type(e).__module__.startswith("astcenc_tpu"):
            pytest.fail(f"{name}: unclean error {type(e).__name__}: {e}")
