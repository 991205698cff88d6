.PHONY: test test-fast test-all bench dryrun native clean

# Tiering (VERDICT r3 #6): the bare `pytest tests/` default (= test-fast)
# deselects `slow` one-off goldens AND `heavy` >1-min suites via pyproject
# addopts — the quick inner loop. `test` adds the heavy suites (full
# behavioral coverage); `test-all` adds the slow production-scale goldens.
test:
	python -m pytest tests/ -q -m "not slow"

test-fast:
	python -m pytest tests/ -q

test-all:
	python -m pytest tests/ -q -m ""

bench:
	python bench.py

dryrun:
	python -m pytest tests/test_parallel.py -q

native:
	python -c "from semantic_depth_tpu.native import get_library; assert get_library() is not None; print('native library built')"

clean:
	rm -rf semantic_depth_tpu/native/_build .jax_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
