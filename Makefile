# Gate targets for astcenc-tpu.
#
# `make gate` is the full release gate (VERDICT r1 item 10): it builds the
# reference oracle, runs the complete suite INCLUDING the slow golden
# reference cross-checks, and fails if any golden gate was skipped —
# "passed" can never mean "skipped" here.

REF      ?= /root/reference
REFBUILD ?= /tmp/refbuild
PY       ?= python

.PHONY: test gate oracle native bench quality smoke fuzz

# Cold-start smoke tier (<60 s on a fresh clone, CPU only): table oracles,
# BISE/quant codecs, and the physical block codec — no trial-pipeline
# XLA compiles (those take minutes cold; see tools/run_suite.sh).
smoke:
	JAX_PLATFORMS=cpu $(PY) -m pytest tests/test_ise.py tests/test_quant.py \
	  tests/test_bsd.py -q -x --no-header

# Time-boxed differential container fuzz (malformed .astc/KTX/DDS inputs
# must fail cleanly, never crash); corpus seeds in tests/data/fuzz.
fuzz:
	JAX_PLATFORMS=cpu $(PY) tools/fuzz_astc.py --time-budget 60

# Per-file pytest processes: one long-lived pytest over tests/ can
# segfault jax's XLA:CPU AOT cache loader on small hosts (see
# tests/conftest.py); run_suite.sh contains the blast radius and shares
# compiles through a persistent cache.
test:
	bash tools/run_suite.sh

oracle:
	@test -x $(REFBUILD)/Source/astcenc-native || ( \
	  cmake -S $(REF) -B $(REFBUILD) -DASTCENC_ISA_AVX2=ON \
	        -DASTCENC_WERROR=OFF -DCMAKE_BUILD_TYPE=Release -G Ninja && \
	  ninja -C $(REFBUILD) && \
	  cp $(REFBUILD)/Source/astcenc-avx2 $(REFBUILD)/Source/astcenc-native && \
	  cp $(REFBUILD)/Source/libastcenc-avx2-static.a \
	     $(REFBUILD)/Source/libastcenc-native-static.a )
	tools/build_ref_dump.sh

native:
	native/build.sh

gate: oracle native fuzz
	# Per-file processes (tools/run_suite.sh: jax XLA:CPU AOT cache
	# segfault containment + cross-process compile reuse); -rs prints
	# skip reasons and the grep fails the gate on ANY skipped test so a
	# missing oracle can't silently pass.
	bash tools/run_suite.sh --runslow -rs 2>&1 | tee /tmp/gate.log
	@! grep -E "^(SKIPPED|FAILED)" /tmp/gate.log > /dev/null || \
	  ( echo "GATE FAILURE: skipped/failed golden tests (see above)"; \
	    exit 1 )

bench:
	$(PY) bench.py

quality:
	$(PY) tools/quality_regression.py run --out results/astcenc_tpu_small
	@for p in fastest fast medium thorough; do \
	  $(PY) tools/quality_regression.py gate \
	    --ours results/astcenc_tpu_small_$${p}_results.csv \
	    --ref $(REF)/Test/Images/Small/astc_reference-5.0-avx2_$${p}_results.csv \
	    --tol 0.05 || exit 1; done

# Past-thorough smoke (no committed reference CSVs exist for these): our
# rows vs live reference-binary rows, 6x6 over a corpus subset.
quality-vx:
	$(PY) tools/quality_regression.py refrun --blocks 6x6 --limit 3 \
	  --presets verythorough,exhaustive --out results/astcenc_ref_small
	$(PY) tools/quality_regression.py run --blocks 6x6 --limit 3 \
	  --presets verythorough,exhaustive --out results/astcenc_tpu_small
	@for p in verythorough exhaustive; do \
	  $(PY) tools/quality_regression.py gate \
	    --ours results/astcenc_tpu_small_$${p}_results.csv \
	    --ref results/astcenc_ref_small_$${p}_results.csv \
	    --tol 0.05 || exit 1; done
