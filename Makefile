# Convenience targets (see README.md / BASELINE.md for details)

.PHONY: test test-fast test-core test-tpu bench benchmarks gate golden native clean

# Suite cost (1-CPU box): full ~45 min (compile-dominated kernel
# suites). The persistent XLA compile cache is deliberately DISABLED in
# tests/conftest.py — this jaxlib's executable (de)serialization
# crash-killed xdist workers on several of this repo's programs (see the
# conftest comment). -n auto parallelizes across cores where available
# (each xdist worker gets its own 8-fake-device backend —
# process-parallel safe).
#
# Concurrency with a chip job: on tunneled (axon) runtimes the site hook
# in PYTHONPATH initializes the TPU plugin even under JAX_PLATFORMS=cpu,
# so a CPU suite BLOCKS on the chip lock while test-tpu/bench runs.
# Strip it to run both at once:  PYTHONPATH= make test-fast
test:            ## full suite (CPU, 8 virtual devices via tests/conftest.py)
	python -m pytest tests/ -q -n auto

test-fast:       ## skip the slow interpret-mode kernel suites (marker: slow)
	python -m pytest tests/ -q -n auto -m "not slow"

# Sub-10-minute core tier (1-CPU box; measured per file, ~5 min total):
# golden-anchored parity 14s, config/quaternion/scene units 11s, scene IO
# 40s, RNG 18s, light selection 55s, ONE rebin parity case as the kernel
# smoke (cluster megakernel + bounce kernels + regroup sort in interpret
# mode, ~100s), ONE sharded-vs-single case as the mesh smoke. Keeps
# future rounds honest without the ~45 min full-suite tax.
test-core:       ## quick correctness core (golden parity + units + smoke)
	python -m pytest -q -n auto -m "not slow" \
	  tests/test_parity_jnp_vs_golden.py tests/test_config.py \
	  tests/test_quaternion.py tests/test_scene.py tests/test_sceneio.py \
	  tests/test_pallas_rng.py tests/test_light_power.py \
	  "tests/test_rebin.py::test_rebin_bit_identical_to_mega[oct]" \
	  "tests/test_sharding.py::test_sharded_matches_single_device[8-1]"

test-tpu:        ## compiled-kernel parity tier (needs a real TPU; run before benchmarks)
	python -m pytest tests_tpu/ -q

bench:           ## headline benchmark (run on TPU hardware)
	python bench.py

benchmarks:      ## all BASELINE configs (run on TPU hardware)
	python benchmarks/run_all.py

gate:            ## perf-regression gate: fresh chip run vs history medians
	python benchmarks/gate.py

golden:          ## regenerate the stored golden artifact (slow scalar render)
	GOLDEN_REGEN=1 python -m pytest tests/test_parity_jnp_vs_golden.py -q

native:          ## force-rebuild the C++ BVH builder
	rm -rf raytracing_engine_tpu/native/build
	python -c "from raytracing_engine_tpu.native.loader import native_available; print('native:', native_available())"

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
