.PHONY: help test test-fast bench native lint clean

help:
	@echo "AtlasPatch-TPU Development Commands"
	@echo "===================================="
	@echo "  make test       - Run the full pytest suite (8-device virtual CPU mesh)"
	@echo "  make test-fast  - Fast subset (geometry, storage, native decode, e2e)"
	@echo "  make bench      - Run the headline benchmark (one JSON line)"
	@echo "  make native     - Force-rebuild the native C++ library"
	@echo "  make lint       - Byte-compile all sources (import/syntax check)"
	@echo "  make clean      - Remove caches and build artifacts"

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/test_polygon.py tests/test_native_contours.py \
	  tests/test_native_tiff.py tests/test_storage.py tests/test_config.py \
	  tests/test_extraction_parity.py tests/test_pipeline_e2e.py -x -q

bench:
	python bench.py

native:
	python -c "from atlaspatch_tpu.io.native import build_library; print(build_library(force=True))"

lint:
	python -m compileall -q atlaspatch_tpu tests bench.py __graft_entry__.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	rm -f atlaspatch_tpu/io/native/libatlas_native.so
