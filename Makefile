# Convenience targets (tests are sharded across subprocesses to bound XLA
# compile memory — see tools/run_tests.sh).
.PHONY: test test-fast bench

test:
	tools/run_tests.sh

test-fast:
	tools/run_tests.sh -m "not slow"

bench:
	python bench.py
