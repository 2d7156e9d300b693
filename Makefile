# Developer targets (mirror of the reference's Makefile surface:
# all/test/ci/bench — Makefile:63-116).

PY ?= python

.PHONY: all test ci bench bench-all native clean

all: native

native:
	$(PY) -c "from krep_tpu.native import runtime; print('native runtime ok:', runtime._lib)"

test:
	$(PY) -m pytest tests/ -x -q

ci: native test

bench:
	$(PY) bench.py

bench-all:
	$(PY) bench.py --all

clean:
	rm -rf corpus .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
