# Parity: reference Makefile (`make test` runs pytest in CI).
.PHONY: test test-all test-fast bench dryrun examples lint

# default CI gate. Walls on a 1-core box: ~4 min with a warm persistent
# compile cache (/tmp/jaxcache-tests, seeded by the first run), ~15 min cold.
# Compile-heavy mesh/e2e tests carry @pytest.mark.slow (run via test-all,
# ~17 min warm all-in).
test:
	python -m pytest tests/ -q -m "not slow"

# nightly-style full suite
test-all:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not end_to_end and not experiment" -m "not slow"

bench:
	python bench.py

dryrun:
	python __graft_entry__.py 8

examples:
	JAX_PLATFORMS=cpu python examples/search_hybrid.py
	JAX_PLATFORMS=cpu python examples/predict_and_index.py
	JAX_PLATFORMS=cpu python examples/realm_dataloader.py
	JAX_PLATFORMS=cpu python examples/train_periodic.py
