# SPDX-License-Identifier: Apache-2.0
# Top-level targets (the reference's justfile analog, ~90 targets condensed
# to the ones this stack needs).

PY ?= python
CPU_ENV = JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: all test test-fast native fixtures docs serve bench bench-model latency lt e2e licenses changelog release-dryrun clean

all: native fixtures

native:            ## build C++ shims (wasm runtime, libav decode, plugin examples)
	$(MAKE) -C native

fixtures:          ## synthesize sample media (incl. the 10-min loadtest fixture)
	$(PY) tools/make_fixtures.py --long

train-vad:         ## retrain the bundled learned VAD on synthesized data
	$(CPU_ENV) $(PY) tools/train_vad.py

docs:              ## regenerate docs/nodes.md + docs/api.md from the registry
	$(PY) tools/gen_docs.py

test:              ## full suite, parallel (xdist) on the virtual CPU mesh
	$(PY) -m pytest tests/ -q -n auto

test-serial:       ## full suite, one process (debugging)
	$(PY) -m pytest tests/ -q

test-fast:         ## skip the slow model/parity/e2e suites (marker-based)
	$(PY) -m pytest tests/ -q -m "not slow" -n auto

serve:             ## run the server (loopback, default config)
	$(PY) -m streamkit_tpu.server serve --address 127.0.0.1 --port 8080

bench:             ## headline benchmark (engine mode + model ceiling; TPU)
	$(PY) bench.py

bench-model:       ## model-only device ceiling
	SK_BENCH_MODE=model $(PY) bench.py

latency:           ## streaming partial-latency benchmark (TPU)
	$(PY) benchmarks/latency_bench.py

lt:                ## quick load-test preset against a local server
	$(PY) -m streamkit_tpu.cli lt samples/loadtest/dynamic-lt.toml

e2e:               ## browser e2e (needs playwright + chromium)
	$(PY) e2e/run.py

licenses:          ## third-party license inventory + policy gate (cargo-deny analog)
	$(PY) tools/licenses.py

changelog:         ## regenerate CHANGELOG.md from git history
	$(CPU_ENV) $(PY) tools/release.py changelog

release-dryrun:    ## version check + changelog + dist tarball into a temp dir
	$(CPU_ENV) $(PY) tools/release.py dryrun

clean:
	$(MAKE) -C native clean
	rm -rf docs/nodes.md docs/api.md .pytest_cache
