.PHONY: test test-fast bench dryrun native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q --ignore=tests/test_weights.py --ignore=tests/test_integration_mockup.py

bench:
	python bench.py

dryrun:
	python -m pytest tests/test_parallel.py -q

native:
	python -c "from semantic_depth_tpu.native import get_library; assert get_library() is not None; print('native library built')"

clean:
	rm -rf semantic_depth_tpu/native/_build .jax_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
