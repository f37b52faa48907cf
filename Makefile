# Parity: reference Makefile (`make test` runs pytest in CI).
.PHONY: test test-fast bench dryrun examples lint

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not end_to_end and not experiment"

bench:
	python bench.py

dryrun:
	python __graft_entry__.py 8

examples:
	JAX_PLATFORMS=cpu python examples/search_hybrid.py
	JAX_PLATFORMS=cpu python examples/predict_and_index.py
	JAX_PLATFORMS=cpu python examples/realm_dataloader.py
	JAX_PLATFORMS=cpu python examples/train_periodic.py
