# Convenience targets (see README.md / BASELINE.md for details)

.PHONY: test test-fast test-tpu bench benchmarks golden native clean

test:            ## full suite (CPU, 8 virtual devices via tests/conftest.py)
	python -m pytest tests/ -q

test-fast:       ## skip the slow interpret-mode kernel suites
	python -m pytest tests/ -q --ignore=tests/test_megakernel.py \
	  --ignore=tests/test_clusters.py --ignore=tests/test_packet_bvh.py \
	  --ignore=tests/test_instanced_kernel.py

test-tpu:        ## compiled-kernel parity tier (needs a real TPU; run before benchmarks)
	python -m pytest tests_tpu/ -q

bench:           ## headline benchmark (run on TPU hardware)
	python bench.py

benchmarks:      ## all BASELINE configs (run on TPU hardware)
	python benchmarks/run_all.py

golden:          ## regenerate the stored golden artifact (slow scalar render)
	GOLDEN_REGEN=1 python -m pytest tests/test_parity_jnp_vs_golden.py -q

native:          ## force-rebuild the C++ BVH builder
	rm -rf raytracing_engine_tpu/native/build
	python -c "from raytracing_engine_tpu.native.loader import native_available; print('native:', native_available())"

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
